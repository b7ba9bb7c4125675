"""Warm-start decomposition (VERDICT r4 task #5).

Round-4 data: bench.py "warm" compile was 161-195 s against a reference
that compiles once into a reusable binary. This measures WHERE a warm
start spends its time on the axon TPU, in one fresh process:

  1. Python trace + lowering of the bench graph (what engine/aot.py's
     artifact eliminates),
  2. compile_or_get_cached — on a warm persistent cache this is
     deserialize-executable + transfer over the tunnel,
  3. first dispatch.

Also times the AOT path (deserialize aot.bin -> compile) for comparison.

Usage: python scripts/exp_warm_start.py [B] [--aot path]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from circuits_tpu.utils.compile_opts import enable_persistent_cache

enable_persistent_cache(jax)

from bench import build_tiled_inputs
from circuits_tpu.models.rollup_main import rollup_main_lanes

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NLEV, MFT = 32, 64

print(f"platform={jax.devices()[0].platform} B={B}", flush=True)

t0 = time.time()
tiled, chains = build_tiled_inputs(B, NLEV, MFT, jnp)
print(f"host inputs: {time.time()-t0:.1f}s", flush=True)

fn = jax.jit(partial(rollup_main_lanes, n_tx=B, n_levels=NLEV,
                     max_fee_tx=MFT))

t0 = time.time()
lowered = fn.lower(tiled, chains)
t_lower = time.time() - t0
print(f"trace+lower: {t_lower:.1f}s", flush=True)

t0 = time.time()
compiled = lowered.compile()
t_compile = time.time() - t0
print(f"compile_or_get_cached: {t_compile:.1f}s "
      f"(cache dir {jax.config.jax_compilation_cache_dir})", flush=True)

t0 = time.time()
out = compiled(tiled, chains)
np.asarray(out[0]["new_state_root"][0, 0])
t_first = time.time() - t0
print(f"first dispatch+fetch: {t_first:.1f}s", flush=True)
print(f"WARM TOTAL (trace+compile+first): "
      f"{t_lower + t_compile + t_first:.1f}s", flush=True)

# executable size (the tunnel-transfer mass)
try:
    sz = len(compiled.runtime_executable().serialize())
    print(f"executable size: {sz/1e6:.1f} MB", flush=True)
except Exception as e:
    print(f"executable size: n/a ({e})", flush=True)
