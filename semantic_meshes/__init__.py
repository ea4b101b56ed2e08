"""semantic-meshes (TPU-native): mesh annotation by multi-view fusion of 2D
semantic segmentation, rebuilt on JAX/XLA/Pallas.

Public surface mirrors the reference package
(ref: python/semantic_meshes/__init__.py:1-4): `data`, `fusion`, `render`,
`data2`, plus TPU-native extensions (`distributed`, `metrics`, `geometry`).
"""

import os as _os

if _os.environ.get("SM_PLATFORM"):
    # The axon TPU plugin re-asserts itself over JAX_PLATFORMS; this forces
    # the platform through jax.config (used by tests/subprocesses to pin CPU)
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SM_PLATFORM"])

from . import checkpoint  # noqa: F401
from . import data  # noqa: F401
from . import data2  # noqa: F401
from . import distributed  # noqa: F401
from . import fusion  # noqa: F401
from . import geometry  # noqa: F401
from . import metrics  # noqa: F401
from . import ops  # noqa: F401
from . import parallel  # noqa: F401
from . import profiling  # noqa: F401
from . import render  # noqa: F401

__version__ = "0.1.0"
