"""Small shared utilities: palettes and colorization helpers.

The reference scripts lean on the external `distinctipy` package for class
palettes (ref: python/scripts/colorize_mesh.py:78,
eval-scannet/eval_scannet.py:33); this module provides a dependency-free
equivalent plus the colorize helper used by the eval debug dumps.
"""

from __future__ import annotations

import colorsys

import numpy as np


def distinct_colors(n, seed=0):
    """n visually-distinct RGB uint8 colors.

    Golden-ratio hue stepping with alternating saturation/value bands —
    deterministic, fast, and distinct enough for class palettes.
    """
    phi = (np.sqrt(5) - 1) / 2
    colors = np.empty((n, 3), np.uint8)
    h = (seed * phi) % 1.0
    for i in range(n):
        h = (h + phi) % 1.0
        s = (0.95, 0.65, 0.8)[i % 3]
        v = (0.95, 0.75, 0.55)[(i // 3) % 3]
        colors[i] = np.round(
            np.asarray(colorsys.hsv_to_rgb(h, s, v)) * 255.0
        )
    return colors


def class_palette(classes_num, seed=0):
    """Palette for `classes_num` classes; prefers distinctipy when present
    (bit-compatible with reference scripts), falls back to distinct_colors."""
    try:
        from distinctipy import distinctipy

        return (
            np.asarray(distinctipy.get_colors(classes_num)) * 255.0
        ).astype(np.uint8)
    except ImportError:
        return distinct_colors(classes_num, seed)


def remap_mask_colors(mask, color_to_class):
    """Map a color (or grayscale) mask image to class indices, assigning
    each distinct color a class id on first sight (the reference
    colorize_mesh remap semantics, ref:
    python/scripts/colorize_mesh.py:44-56). `color_to_class` is the
    persistent dict carried across masks; returns an (H, W) int class map.
    Shared by scripts/colorize_mesh.py and scripts/render_annotations.py.
    """
    mask = np.asarray(mask)
    channels = mask.shape[2] if mask.ndim == 3 else 1
    shape = mask.shape[:2]
    flat = mask.reshape(-1, channels)
    unique_colors, inv = np.unique(flat, axis=0, return_inverse=True)
    for c in map(tuple, unique_colors.tolist()):
        color_to_class.setdefault(c, len(color_to_class))
    unique_classes = np.array(
        [color_to_class[tuple(c.tolist())] for c in unique_colors]
    )
    return unique_classes[inv].reshape(shape)


def palette_from_color_map(color_to_class, classes_num):
    """Rebuild the (classes, 3) uint8 palette from a first-sight
    color->class map (grayscale colors broadcast to gray RGB)."""
    palette = np.zeros((classes_num, 3), np.uint8)
    for color, class_index in color_to_class.items():
        palette[class_index] = (
            color if len(color) == 3 else (color[0],) * 3
        )
    return palette
