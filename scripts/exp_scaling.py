"""Measure: compile time of lax.scan whose body has k chained mont_muls."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

from circuits_tpu.field import fr


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"{name:28s} trace={t1-t0:6.2f}s compile={t2-t1:7.2f}s "
          f"hlo_lines={len(lowered.as_text().splitlines()):7d}", flush=True)


T = 8
a = fr.pack(list(range(1, T + 1)))

for k in [1, 5, 13, 25]:
    def scan_k(x, k=k):
        def body(c, _):
            for _ in range(k):
                c = fr.mont_mul(c, x)
            return c, None
        out, _ = jax.lax.scan(body, x, None, length=64)
        return out
    timeit(f"scan64_body_{k}_muls", scan_k, a)

# also: individual pieces of eddsa
from circuits_tpu.ops import babyjubjub as bjj
bits = jnp.zeros((253, T), dtype=jnp.uint32)
timeit("scalar_mul_base8", bjj.scalar_mul_base8, bits)
pt = bjj.from_affine_mont(fr.to_mont(a), fr.to_mont(a))
timeit("scalar_mul_var", lambda b: bjj.scalar_mul_var(b, pt), bits)
