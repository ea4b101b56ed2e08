# Container for semantic-meshes (TPU-native rebuild).
#
# The reference ships a CUDA 11.1 + TF 2.4 devel image that compiles the
# whole CUDA/boost stack (ref: Dockerfile:1-23, install.sh). Nothing here
# needs a device toolchain: the package is pure JAX (CPU wheels in the
# image; on a TPU VM install jax[tpu] instead) plus one optional C++
# shared library built with the distro g++.
FROM python:3.12-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/semantic-meshes
COPY pyproject.toml README.md ./
COPY semantic_meshes ./semantic_meshes
COPY native ./native
COPY scripts ./scripts
COPY eval-scannet ./eval-scannet
COPY tests ./tests
COPY __graft_entry__.py bench.py ./

RUN pip install --no-cache-dir -e .[test,scripts,eval,models] \
    && pip install --no-cache-dir "jax[cpu]" flax optax imageio tqdm pyyaml pytest \
    && make -C native

# TPU deployment: rebuild on a TPU VM with
#   pip install -e . "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
CMD ["python", "-m", "pytest", "tests/", "-q"]
