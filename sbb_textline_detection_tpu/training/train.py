"""Training for the pixelwise-segmentation model family.

The reference repo ships no training code — its models are trained in the
sibling sbb_pixelwise_segmentation repo (upstream README.md:17) and consumed
as .h5 checkpoints. A complete framework must close that loop, so this
module provides SPMD training for the TpuUnet family:

  * loss: per-pixel softmax cross-entropy (optionally class-weighted — page
    layout classes are heavily imbalanced);
  * `make_train_step` returns a jit-able (params, opt_state, batch) step;
    under a (data, model) mesh the batch shards over `data` and conv output
    channels over `model` (see parallel/mesh.py) — XLA inserts the gradient
    psum and weight all-gathers over ICI;
  * `Trainer` — a minimal loop with checkpointing via models/checkpoint.py;
  * `synthetic_batch` — page-like synthetic data for smoke training and the
    multi-chip dry run.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sbb_textline_detection_tpu.models import registry
from sbb_textline_detection_tpu.models.registry import ModelSpec


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       class_weights: Optional[jax.Array] = None) -> jax.Array:
    """Mean per-pixel softmax cross-entropy. logits (N,H,W,C), labels (N,H,W)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    if class_weights is not None:
        w = jnp.take(class_weights, labels.astype(jnp.int32))
        return -(ll * w).sum() / jnp.maximum(w.sum(), 1e-6)
    return -ll.mean()


def make_optimizer(learning_rate: float = 3e-4,
                   weight_decay: float = 1e-4) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def make_train_step(spec: ModelSpec,
                    tx: optax.GradientTransformation,
                    class_weights: Optional[np.ndarray] = None) -> Callable:
    """Returns step(params, opt_state, images_f32, labels_i32) ->
    (params, opt_state, loss). Pure function — jit/pjit it with whatever
    shardings the caller chose."""
    module = registry.build_module(spec)
    heads = tuple(spec.heads)
    if class_weights is not None and heads:
        # the heads have disjoint label spaces (e.g. region 0-2 vs
        # textline 0-1): one shared table would silently weight textline
        # pixels with region weights — fail loudly until per-head tables
        # exist
        raise ValueError("class_weights is not supported with a multi-head "
                         "spec; pass per-head weights via separate steps")
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def step(variables, opt_state, images, labels):
        def loss_fn(v):
            logits = module.apply(v, images)
            if heads:
                # dual-head: labels (N,H,W,len(heads)); summed per-head CE
                # over the logit slices (registry.ModelSpec.heads)
                total, off = 0.0, 0
                for hi, width in enumerate(heads):
                    total = total + cross_entropy_loss(
                        logits[..., off:off + width], labels[..., hi], cw)
                    off += width
                return total
            return cross_entropy_loss(logits, labels, cw)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss

    return step


def synthetic_batch(rng: np.random.Generator, n: int, h: int, w: int,
                    n_classes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Page-like synthetic data: white background, dark stripes labeled as
    the positive class(es)."""
    imgs = np.full((n, h, w, 3), 1.0, np.float32)
    labels = np.zeros((n, h, w), np.int32)
    for i in range(n):
        n_lines = int(rng.integers(2, max(3, h // 24)))
        for _ in range(n_lines):
            y = int(rng.integers(0, max(1, h - 8)))
            lh = int(rng.integers(4, 9))
            x0 = int(rng.integers(0, w // 4))
            x1 = int(rng.integers(3 * w // 4, w))
            imgs[i, y:y + lh, x0:x1] = rng.uniform(0.0, 0.3)
            labels[i, y:y + lh, x0:x1] = min(1, n_classes - 1)
    return imgs, labels


@dataclasses.dataclass
class Trainer:
    spec: ModelSpec
    learning_rate: float = 3e-4
    seed: int = 0

    def __post_init__(self):
        self.tx = make_optimizer(self.learning_rate)
        self.variables = registry.init_variables(self.spec, self.seed)
        self.opt_state = jax.jit(self.tx.init)(self.variables)
        self._step = jax.jit(make_train_step(self.spec, self.tx))

    def train(self, data_iter, steps: int):
        losses = []
        for _ in range(steps):
            images, labels = next(data_iter)
            self.variables, self.opt_state, loss = self._step(
                self.variables, self.opt_state,
                jnp.asarray(images), jnp.asarray(labels))
            # keep the loss a device array: float(loss) would force a
            # device->host sync EVERY step on the stall-prone tunnel;
            # callers fetch at log/checkpoint boundaries
            losses.append(loss)
        return [float(v) for v in jax.device_get(losses)]

    def save(self, path: str):
        from sbb_textline_detection_tpu.models import checkpoint
        checkpoint.save(path, self.spec, jax.tree_util.tree_map(
            np.asarray, self.variables))
