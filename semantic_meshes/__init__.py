"""semantic-meshes (TPU-native): mesh annotation by multi-view fusion of 2D
semantic segmentation, rebuilt on JAX/XLA/Pallas.

Public surface mirrors the reference package
(ref: python/semantic_meshes/__init__.py:1-4): `data`, `fusion`, `render`,
`data2`, plus TPU-native extensions (`distributed`, `metrics`, `geometry`).
"""

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
