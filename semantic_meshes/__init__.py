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

if _os.environ.get("SM_COMPILE_CACHE"):
    # Persistent XLA compilation cache: makes renderer/fusion first-call
    # compiles (~30 s each through a tunneled compile service) a one-time
    # cost across PROCESSES, not per run — big for multi-scene eval drivers.
    import jax as _jax2

    _jax2.config.update(
        "jax_compilation_cache_dir", _os.environ["SM_COMPILE_CACHE"]
    )
    _jax2.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from . import checkpoint  # noqa: F401
from . import data  # noqa: F401
from . import data2  # noqa: F401
from . import distributed  # noqa: F401
from . import fusion  # noqa: F401
from . import geometry  # noqa: F401
from . import metrics  # noqa: F401
from . import ops  # noqa: F401
from . import profiling  # noqa: F401
from . import render  # noqa: F401

__version__ = "0.1.0"
