"""Probe whether the persistent compilation cache HITS across
processes on this backend (observed: same-config bench reruns write
new jit__group entries every session — diagnosing the key mismatch).

Run twice: first populates, second should load. Prints cache events.
"""

import logging
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_cache_probe")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:
    jax.config.update("jax_explain_cache_misses", True)
except Exception:
    pass

for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("%(name)s: %(message)s"))
    lg.addHandler(h)

import numpy as np  # noqa: E402

print(f"# devices {jax.devices()}", flush=True)
x = np.ones((2048, 2048), np.float32)
f = jax.jit(lambda a: (a @ a).sum())
t0 = time.time()
v = float(f(x))
print(f"# first call {time.time() - t0:.2f}s value {v}", flush=True)
