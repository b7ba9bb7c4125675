"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere (pytest imports conftest first).
"""

import os

# Hard override: the session environment may point JAX at the remote TPU
# tunnel (JAX_PLATFORMS=axon); unit tests must run on a local 8-device
# virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from circuits_tpu.utils.compile_opts import enable_cpu_fast_compile  # noqa: E402

enable_cpu_fast_compile()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, freezing the config before this file runs — the
# env override above is not enough; update the live config too.
jax.config.update("jax_platforms", "cpu")

# Same persistent-cache settings as every other entry point: a config
# mismatch (this file used to set enable_xla_caches="all" vs "none"
# elsewhere) changes the cache key and turns every cross-process reuse
# into a cold compile (round-3 VERDICT weak #4).
from circuits_tpu.utils.compile_opts import enable_persistent_cache  # noqa: E402

enable_persistent_cache(jax)
