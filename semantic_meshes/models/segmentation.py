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


def _ensure_rgb(image):
    """uint8 (H, W) / (H, W, 3) / (H, W, 4) -> (H, W, 3)."""
    image = jnp.asarray(image)
    if image.ndim == 2:
        image = jnp.stack([image] * 3, axis=-1)
    if image.shape[-1] == 4:
        image = image[..., :3]
    return image


def _ensure_rgb_batch(images):
    """(N, H, W) / (N, H, W, 1|3|4) -> (N, H, W, 3) — so the batch fast
    path accepts every shape the per-image predictor does (sliding()
    feeds raw window crops straight to .batch)."""
    x = jnp.asarray(images)
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
    if x.shape[-1] == 4:
        x = x[..., :3]
    return x


def _window_starts(size, win, overlap):
    """Static window start offsets covering [0, size) with >= `overlap`
    fractional overlap between neighbours; the last window is clamped to
    end exactly at `size` (every pixel covered, no padding)."""
    if size <= win:
        return [0]
    stride = max(int(win * (1.0 - overlap)), 1)  # floor honors >= overlap
    starts = list(range(0, size - win, stride))
    starts.append(size - win)
    return starts


def sliding(predict, window_hw, overlap=0.2):
    """Sliding-window inference combinator (the tfcv.predict.sliding role
    in the reference's demo, ref:
    python/scripts/colorize_cityscapes_mesh.py:42).

    Wraps a `predict(*images) -> (H, W, classes)` fn: inputs are split
    into overlapping `window_hw` windows, predicted per-window, and the
    probabilities averaged where windows overlap. Images at or below the
    window size pass straight through.

    TPU-first: when the predictor exposes a `.batch(*stacks)` fn (the
    bundled loaders do), ALL windows run as one batched MXU dispatch
    instead of one program per window. Window offsets are static python
    ints, so the merge is static-slice `at[].add` — no scatter.
    """
    wh, ww = int(window_hw[0]), int(window_hw[1])
    batch = getattr(predict, "batch", None)

    def predict_sliding(*inputs):
        arrs = [jnp.asarray(a) for a in inputs]
        H, W = arrs[0].shape[0], arrs[0].shape[1]
        win_h, win_w = min(wh, H), min(ww, W)
        ys = _window_starts(H, win_h, overlap)
        xs = _window_starts(W, win_w, overlap)
        if len(ys) == 1 and len(xs) == 1:
            return predict(*inputs)
        wins = [
            tuple(a[y:y + win_h, x:x + win_w] for a in arrs)
            for y in ys for x in xs
        ]
        if batch is not None:
            stacks = [
                jnp.stack([w[i] for w in wins])
                for i in range(len(arrs))
            ]
            probs = batch(*stacks)  # (N, win_h, win_w, C)
        else:
            probs = jnp.stack([predict(*w) for w in wins])
        acc = jnp.zeros((H, W, probs.shape[-1]), jnp.float32)
        cnt = jnp.zeros((H, W, 1), jnp.float32)
        k = 0
        for y in ys:
            for x in xs:
                acc = acc.at[y:y + win_h, x:x + win_w].add(probs[k])
                cnt = cnt.at[y:y + win_h, x:x + win_w].add(1.0)
                k += 1
        return acc / cnt

    predict_sliding.params = getattr(predict, "params", None)
    predict_sliding.model = getattr(predict, "model", None)
    predict_sliding.base = predict
    return predict_sliding


def multi_scale(predict, scales):
    """Multi-scale inference combinator (the tfcv.predict.multi_scale role
    in the reference's demo, ref:
    python/scripts/colorize_cityscapes_mesh.py:43): run `predict` on the
    inputs resized by each scale factor, resize the class probabilities
    back to the native resolution, and average over scales."""
    scales = [float(s) for s in scales]

    def predict_ms(*inputs):
        arrs = [jnp.asarray(a) for a in inputs]
        H, W = arrs[0].shape[0], arrs[0].shape[1]
        acc = None
        for s in scales:
            hw = (max(int(round(H * s)), 1), max(int(round(W * s)), 1))
            if hw == (H, W):
                p = predict(*arrs)
            else:
                scaled = [
                    _resize_bilinear(a.astype(jnp.float32), hw)
                    for a in arrs
                ]
                p = _resize_bilinear(predict(*scaled), (H, W))
            acc = p if acc is None else acc + p
        return acc / len(scales)

    predict_ms.params = getattr(predict, "params", None)
    predict_ms.model = getattr(predict, "model", None)
    predict_ms.base = predict
    return predict_ms


# aliases for use inside the loaders, whose kwargs shadow the public names
_sliding_combinator = sliding
_multi_scale_combinator = multi_scale


def load_predictor(classes=19, params_path=None, input_hw=(512, 512),
                   widths=(64, 128, 256, 512), arch="unet",
                   sliding=None, sliding_overlap=0.2, multi_scale=None,
                   params=None):
    """Build a jitted predictor: uint8 RGB (H, W, 3) -> softmax probs
    (H, W, classes) at the original resolution. arch: "unet" | "pspnet".

    sliding: optional (h, w) window — overlapping-window inference with
    probability averaging (batched into one MXU dispatch per image).
    multi_scale: optional scale list — average predictions over resized
    copies of the input. Composition order matches the reference demo
    (sliding innermost), ref: python/scripts/colorize_cityscapes_mesh.py:42-43.
    """
    if not HAVE_FLAX:  # pragma: no cover
        raise ImportError("flax is required for the bundled segmentation model")
    cls = {"unet": UNet, "pspnet": PSPNet}[arch]
    model = cls(classes=classes, widths=tuple(widths))
    if params is not None and params_path is not None:
        raise ValueError("pass params or params_path, not both")
    if params is None:
        rng = jax.random.PRNGKey(0)
        params = model.init(
            rng, jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
        )
        if params_path is not None:
            with open(params_path, "rb") as f:
                params = serialization.from_bytes(params, f.read())

    @jax.jit
    def run(params, x):
        logits = model.apply(params, x)
        return jax.nn.softmax(logits, axis=-1)

    def predict_batch(images):
        """(N, H, W, 3) uint8-like -> (N, H, W, classes), one dispatch."""
        x = _ensure_rgb_batch(images).astype(jnp.float32) / 255.0
        n, h, w = x.shape[:3]
        x = jax.image.resize(x, (n,) + tuple(input_hw) + (3,), "bilinear")
        probs = run(params, x)
        return jax.image.resize(probs, (n, h, w, probs.shape[-1]),
                                "bilinear")

    def predict(image):
        image = _ensure_rgb(image)
        return predict_batch(image[None])[0]

    predict.params = params
    predict.model = model
    predict.batch = predict_batch
    if sliding is not None:
        predict = _sliding_combinator(predict, sliding, sliding_overlap)
    if multi_scale:
        predict = _multi_scale_combinator(predict, multi_scale)

    def predict_rgb(image, _p=predict):
        return _p(_ensure_rgb(image))

    predict_rgb.params = params
    predict_rgb.model = model
    if sliding is None and not multi_scale:
        predict_rgb.batch = predict_batch
    return predict_rgb


def load_rgbd_predictor(classes=40, params_path=None, input_hw=(480, 640),
                        widths=(64, 128, 256, 512), depth_scale=1e-3,
                        sliding=None, sliding_overlap=0.2, multi_scale=None,
                        params=None):
    """Jitted RGB-D predictor: (color uint8 (H, W, 3), depth uint16/float
    (H, W)) -> softmax probs (H, W, classes) at the color resolution.

    sliding / multi_scale: see load_predictor — the depth map is resized
    to the color resolution before windowing/scaling so both streams see
    the same crops."""
    if not HAVE_FLAX:  # pragma: no cover
        raise ImportError("flax is required for the bundled segmentation model")
    model = RGBDUNet(classes=classes, widths=tuple(widths))
    if params is not None and params_path is not None:
        raise ValueError("pass params or params_path, not both")
    if params is None:
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
        logits = model.apply(params, rgb, depth)
        return jax.nn.softmax(logits, axis=-1)

    def predict_batch(colors, depths):
        """(N, H, W, 3) + (N, H, W, 1) [meters] -> (N, H, W, classes)."""
        rgb = _ensure_rgb_batch(colors).astype(jnp.float32) / 255.0
        n, h, w = rgb.shape[:3]
        rgb = jax.image.resize(rgb, (n,) + tuple(input_hw) + (3,),
                               "bilinear")
        d = jax.image.resize(
            jnp.asarray(depths).astype(jnp.float32),
            (n,) + tuple(input_hw) + (1,), "bilinear",
        )
        probs = run(params, rgb, d)
        return jax.image.resize(probs, (n, h, w, probs.shape[-1]),
                                "bilinear")

    def predict_core(color, depth_m):
        return predict_batch(color[None], depth_m[None])[0]

    predict_core.params = params
    predict_core.model = model
    predict_core.batch = predict_batch
    core = predict_core
    if sliding is not None:
        core = _sliding_combinator(core, sliding, sliding_overlap)
    if multi_scale:
        core = _multi_scale_combinator(core, multi_scale)

    def predict(color, depth):
        color = _ensure_rgb(color)
        # depth to meters at the color resolution, so window/scale crops
        # of the two streams stay aligned
        d = jnp.asarray(depth).astype(jnp.float32) * depth_scale
        d = _resize_bilinear(d[..., None], color.shape[:2])
        return core(color, d)

    predict.params = params
    predict.model = model
    return predict
