"""JAX/flax 2D semantic-segmentation model for the demo pipeline.

The reference treats the segmentation model as an external dependency (tfcv
PSPNet / ESANet, ref: python/scripts/colorize_cityscapes_mesh.py:39-43,
eval-scannet/eval_scannet.py:84-86). For a self-contained TPU-native stack we
bundle a compact U-Net that runs entirely on the MXU:

- convolutions in bfloat16 with float32 accumulation (MXU-native),
- GroupNorm + GELU,
- static input size (jit-friendly); images are resized in/out.

`load_predictor` returns `image (H, W, 3) uint8 -> probs (H, W, classes)
float32 softmax`. Weights can be loaded from a flax msgpack checkpoint;
random init otherwise (pipeline testing / finetuning starting point).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    from flax import serialization

    HAVE_FLAX = True
except ImportError:  # pragma: no cover
    HAVE_FLAX = False


if HAVE_FLAX:

    class ConvBlock(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            for _ in range(2):
                x = nn.Conv(
                    self.features, (3, 3), padding="SAME",
                    dtype=jnp.bfloat16, param_dtype=jnp.float32,
                )(x)
                x = nn.GroupNorm(
                    num_groups=min(32, self.features), dtype=jnp.float32
                )(x.astype(jnp.float32))
                x = nn.gelu(x)
            return x

    class UNet(nn.Module):
        """Encoder-decoder segmentation net (channels MXU-aligned)."""

        classes: int = 19
        widths: tuple = (64, 128, 256, 512)

        @nn.compact
        def __call__(self, x):
            # x: (B, H, W, 3) float32 in [0, 1]
            skips = []
            for w in self.widths[:-1]:
                x = ConvBlock(w)(x)
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvBlock(self.widths[-1])(x)
            for w, skip in zip(reversed(self.widths[:-1]), reversed(skips)):
                b, h, ww, c = x.shape
                x = jax.image.resize(x, (b, h * 2, ww * 2, c), "nearest")
                x = nn.Conv(
                    w, (1, 1), dtype=jnp.bfloat16, param_dtype=jnp.float32
                )(x)
                x = jnp.concatenate([x.astype(jnp.float32), skip], axis=-1)
                x = ConvBlock(w)(x)
            logits = nn.Conv(
                self.classes, (1, 1), dtype=jnp.float32,
                param_dtype=jnp.float32,
            )(x)
            return logits


if HAVE_FLAX:

    class PSPNet(nn.Module):
        """Pyramid-scene-parsing segmentation net (the PSPNet role in the
        reference's Cityscapes demo, ref:
        python/scripts/colorize_cityscapes_mesh.py:40-43): conv encoder +
        pyramid pooling module + upsampling head. MXU-friendly bf16 convs."""

        classes: int = 19
        widths: tuple = (64, 128, 256, 512)
        bins: tuple = (1, 2, 4, 8)

        @nn.compact
        def __call__(self, x):
            # encoder (stride 8)
            for w in self.widths[:-1]:
                x = ConvBlock(w)(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvBlock(self.widths[-1])(x)
            b, h, w_, c = x.shape
            # pyramid pooling: global context at multiple bin sizes
            branches = [x]
            for nbins in self.bins:
                p = nn.avg_pool(
                    x, (max(h // nbins, 1), max(w_ // nbins, 1)),
                    strides=(max(h // nbins, 1), max(w_ // nbins, 1)),
                )
                p = nn.Conv(
                    c // len(self.bins), (1, 1), dtype=jnp.bfloat16,
                    param_dtype=jnp.float32,
                )(p)
                p = jax.image.resize(
                    p.astype(jnp.float32),
                    (b, h, w_, c // len(self.bins)), "bilinear",
                )
                branches.append(p)
            x = jnp.concatenate(branches, axis=-1)
            x = ConvBlock(self.widths[-2])(x)
            logits = nn.Conv(
                self.classes, (1, 1), dtype=jnp.float32,
                param_dtype=jnp.float32,
            )(x)
            return jax.image.resize(
                logits, (b, h * 8, w_ * 8, self.classes), "bilinear"
            )


    class RGBDUNet(nn.Module):
        """Dual-encoder RGB-D segmentation net (the ESANet role in the
        reference's ScanNet eval, ref: eval-scannet/eval_scannet.py:84-86):
        separate color/depth encoders, depth features added into the color
        stream at each scale, shared U-Net decoder."""

        classes: int = 40
        widths: tuple = (64, 128, 256, 512)

        @nn.compact
        def __call__(self, rgb, depth):
            # rgb: (B, H, W, 3), depth: (B, H, W, 1), both float32
            skips = []
            x = rgb
            d = depth
            for w in self.widths[:-1]:
                x = ConvBlock(w)(x)
                d = ConvBlock(w)(d)
                x = x + d  # fuse depth into the color stream
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                d = nn.max_pool(d, (2, 2), strides=(2, 2))
            x = ConvBlock(self.widths[-1])(x + d)
            for w, skip in zip(reversed(self.widths[:-1]), reversed(skips)):
                b, h, ww, c = x.shape
                x = jax.image.resize(x, (b, h * 2, ww * 2, c), "nearest")
                x = nn.Conv(
                    w, (1, 1), dtype=jnp.bfloat16, param_dtype=jnp.float32
                )(x)
                x = jnp.concatenate([x.astype(jnp.float32), skip], axis=-1)
                x = ConvBlock(w)(x)
            return nn.Conv(
                self.classes, (1, 1), dtype=jnp.float32,
                param_dtype=jnp.float32,
            )(x)


def _resize_bilinear(img, hw):
    return jax.image.resize(
        img, (hw[0], hw[1]) + img.shape[2:], method="bilinear"
    )


def load_predictor(classes=19, params_path=None, input_hw=(512, 512),
                   widths=(64, 128, 256, 512), arch="unet"):
    """Build a jitted predictor: uint8 RGB (H, W, 3) -> softmax probs
    (H, W, classes) at the original resolution. arch: "unet" | "pspnet"."""
    if not HAVE_FLAX:  # pragma: no cover
        raise ImportError("flax is required for the bundled segmentation model")
    cls = {"unet": UNet, "pspnet": PSPNet}[arch]
    model = cls(classes=classes, widths=tuple(widths))
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    )
    if params_path is not None:
        with open(params_path, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    @jax.jit
    def run(params, x):
        logits = model.apply(params, x[None])[0]
        return jax.nn.softmax(logits, axis=-1)

    def predict(image):
        image = jnp.asarray(image)
        if image.ndim == 2:
            image = jnp.stack([image] * 3, axis=-1)
        if image.shape[-1] == 4:
            image = image[..., :3]
        orig_hw = image.shape[:2]
        x = image.astype(jnp.float32) / 255.0
        x = _resize_bilinear(x, input_hw)
        probs = run(params, x)
        return _resize_bilinear(probs, orig_hw)

    predict.params = params
    predict.model = model
    return predict


def load_rgbd_predictor(classes=40, params_path=None, input_hw=(480, 640),
                        widths=(64, 128, 256, 512), depth_scale=1e-3):
    """Jitted RGB-D predictor: (color uint8 (H, W, 3), depth uint16/float
    (H, W)) -> softmax probs (H, W, classes) at the color resolution."""
    if not HAVE_FLAX:  # pragma: no cover
        raise ImportError("flax is required for the bundled segmentation model")
    model = RGBDUNet(classes=classes, widths=tuple(widths))
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32),
        jnp.zeros((1, input_hw[0], input_hw[1], 1), jnp.float32),
    )
    if params_path is not None:
        with open(params_path, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    @jax.jit
    def run(params, rgb, depth):
        logits = model.apply(params, rgb[None], depth[None])[0]
        return jax.nn.softmax(logits, axis=-1)

    def predict(color, depth):
        color = jnp.asarray(color)
        if color.shape[-1] == 4:
            color = color[..., :3]
        orig_hw = color.shape[:2]
        rgb = _resize_bilinear(color.astype(jnp.float32) / 255.0, input_hw)
        d = jnp.asarray(depth).astype(jnp.float32) * depth_scale
        d = _resize_bilinear(d[..., None], input_hw)
        probs = run(params, rgb, d)
        return _resize_bilinear(probs, orig_hw)

    predict.params = params
    predict.model = model
    return predict
