"""Minimal numpy-backed `tensorflow` stand-in.

Only for exercising the `--model tfcv` compatibility plumbing in tests —
this environment has no real TF/tfcv, and without a stub that code path
would be untestable dead code (it is prepended to PYTHONPATH by the tests,
never installed). Implements exactly the surface the scripts touch:
cast / expand_dims / function / image.resize.
"""

import numpy as np


def cast(x, dtype):
    return np.asarray(x).astype(dtype)


def expand_dims(x, axis):
    return np.expand_dims(np.asarray(x), axis)


def function(f, *a, **kw):
    return f


class _Image:
    @staticmethod
    def resize(x, size, method="bilinear"):
        """Nearest-index resize of the leading two spatial dims of an
        (H, W[, C]) array — fidelity is irrelevant for plumbing tests."""
        x = np.asarray(x, np.float32)
        h, w = int(size[0]), int(size[1])
        ri = np.minimum(np.arange(h) * x.shape[0] // h, x.shape[0] - 1)
        ci = np.minimum(np.arange(w) * x.shape[1] // w, x.shape[1] - 1)
        return x[ri][:, ci]


image = _Image()
