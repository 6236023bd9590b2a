"""Cheap TPU tunnel liveness probe: init + one tiny dispatch.

Exit 0 = tunnel healthy.  Run under timeout; a wedge blocks forever.
"""

import sys
import time

import jax
import jax.numpy as jnp

t0 = time.perf_counter()
d = jax.devices()
print(f"# devices {d} ({time.perf_counter() - t0:.1f}s)", flush=True)
x = jnp.arange(8.0)
print(f"# sum {float(x.sum())} ({time.perf_counter() - t0:.1f}s)", flush=True)
sys.exit(0)
