# Container packaging (reference parity: /root/reference/Dockerfile, minus
# the site-local pip proxy). The TPU runtime libraries come from the host
# environment (Cloud TPU VMs ship them); for CPU-only use, JAX's CPU
# backend works out of the box and the test suite runs on a virtual
# 8-device mesh (tests/conftest.py).
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

COPY . /usr/src/sbb_textline_detection_tpu
# setup.py's build shim compiles native/sbb_native.cpp into the package
# (falls back to pure-numpy geometry if the toolchain is missing)
RUN pip install --no-cache-dir "jax[cpu]" flax optax chex einops numpy pillow \
    && pip install --no-cache-dir /usr/src/sbb_textline_detection_tpu

# On a TPU VM, install the TPU backend instead:
#   pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

ENTRYPOINT ["sbb_textline_detector_tpu"]
