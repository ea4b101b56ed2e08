"""Training for the bundled segmentation models (flax + optax).

The reference consumes externally-trained tfcv models and has no training
code; this makes the bundled model family self-sufficient: fine-tune or
train UNet/PSPNet/RGBDUNet on (image, label) pairs, single-chip or
data-parallel over a device mesh.

TPU-native: bf16 convs with f32 params/optimizer state, jitted train step,
`shard_map` data parallelism with `psum` gradient merging over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    import optax
    from flax import serialization

    HAVE_DEPS = True
except ImportError:  # pragma: no cover
    HAVE_DEPS = False

from . import segmentation

IGNORE_LABEL = -1


def softmax_xent_ignore(logits, labels):
    """Mean cross entropy over pixels with label >= 0 (ignore = -1)."""
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


class SegmentationTrainer:
    """Minimal trainer: AdamW + cross-entropy with ignore labels.

    model_args go to the model constructor (classes, widths, ...);
    arch: "unet" | "pspnet" (RGB) — RGB-D uses arch="rgbd".
    """

    def __init__(self, classes, input_hw=(256, 256), arch="unet",
                 widths=(32, 64, 128, 256), learning_rate=3e-4,
                 weight_decay=1e-4, seed=0):
        if not HAVE_DEPS:  # pragma: no cover
            raise ImportError("flax and optax are required for training")
        self.classes = int(classes)
        self.input_hw = tuple(input_hw)
        self.arch = arch
        cls = {
            "unet": segmentation.UNet,
            "pspnet": segmentation.PSPNet,
            "rgbd": segmentation.RGBDUNet,
        }[arch]
        self.model = cls(classes=self.classes, widths=tuple(widths))
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1,) + self.input_hw + (3,), jnp.float32)
        if arch == "rgbd":
            dummy_d = jnp.zeros((1,) + self.input_hw + (1,), jnp.float32)
            self.params = self.model.init(rng, dummy, dummy_d)
        else:
            self.params = self.model.init(rng, dummy)
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()

    def _build_step(self):
        model, tx, arch = self.model, self.tx, self.arch

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                if arch == "rgbd":
                    logits = model.apply(p, batch["image"], batch["depth"])
                else:
                    logits = model.apply(p, batch["image"])
                return softmax_xent_ignore(logits, batch["labels"])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def train_step(self, batch):
        """batch: image (B, H, W, 3) f32 in [0,1], labels (B, H, W) int32
        (-1 ignore), optional depth (B, H, W, 1). Returns scalar loss."""
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch
        )
        return float(loss)

    def predict_logits(self, images):
        if self.arch == "rgbd":
            raise ValueError("use predict_logits_rgbd for rgbd models")
        return self.model.apply(self.params, images)

    def save(self, path):
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.params))

    def load(self, path):
        with open(path, "rb") as f:
            self.params = serialization.from_bytes(self.params, f.read())


def make_data_parallel_step(trainer, mesh, axis="views"):
    """Wrap the trainer's step in shard_map data parallelism: batch sharded
    over `axis`, gradients psum-merged over ICI, params/opt replicated."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    model, tx, arch = trainer.model, trainer.tx, trainer.arch

    batch_specs = {"image": P(axis), "labels": P(axis)}
    if arch == "rgbd":
        batch_specs["depth"] = P(axis)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), batch_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def sharded_step(params, opt_state, batch):
        def loss_fn(p):
            if arch == "rgbd":
                logits = model.apply(p, batch["image"], batch["depth"])
            else:
                logits = model.apply(p, batch["image"])
            return softmax_xent_ignore(logits, batch["labels"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # mean over data-parallel shards
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(sharded_step)
