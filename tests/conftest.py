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

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
