"""Measured multi-device scaling on the virtual CPU mesh.

Runs ONE fixed problem through ``sharded_sweep`` at N = 1, 2, 4, 8
virtual devices (``--xla_force_host_platform_device_count``), reporting
wall time and the itemised phases (compute loop vs drain) so the
ARCHITECTURE.md Amdahl model's serial terms are validated by a real
experiment, not only derived from single-chip anatomy.

IMPORTANT caveat (recorded with the results): the virtual devices share
this host's physical cores, so wall-clock cannot scale past the core
count — what this measures is (a) that per-device WORK falls as 1/N
(the per-step wall at fixed per-device rows stays flat while steps
fall), and (b) the serial terms: the per-step counts all-gather + host
bookkeeping, and the end-of-sweep drain, which the model says are
latency-bound and constant in N respectively.

Usage (sets its own env, run as a fresh process):
    python scripts/perf_scaling.py [S] [L]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon

import time  # noqa: E402

from spydrpick_tpu.core.alignment import Alignment  # noqa: E402
from spydrpick_tpu.engine.solver import EngineConfig, MIEngine  # noqa: E402
from spydrpick_tpu.parallel.mesh import make_mesh, sharded_sweep  # noqa: E402


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    al = Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(S)],
        id_string="scal",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    engine = MIEngine(al, EngineConfig(tile=512, wog_fetch="outliers"))
    # fixed threshold keeping ~100*L edges (the bench's rule)
    ii = rng.integers(0, L, 20000)
    jj = rng.integers(0, L, 20000)
    keep = ii != jj
    sample = engine.pair_mi(np.minimum(ii, jj)[keep], np.maximum(ii, jj)[keep])
    threshold = float(np.quantile(sample, 1 - (100 * L) / (L * (L - 1) / 2)))
    print(f"# S={S} L={L} threshold={threshold:.6f} "
          f"devices={len(jax.devices())} physical_cpus={os.cpu_count()}",
          flush=True)

    results = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n_devices=n)
        tm: dict = {}
        t0 = time.perf_counter()
        edges = sharded_sweep(engine, threshold, mesh=mesh, timings=tm)
        wall = time.perf_counter() - t0  # includes compiles (first N)
        # second run: warm numbers
        tm = {}
        t0 = time.perf_counter()
        edges = sharded_sweep(engine, threshold, mesh=mesh, timings=tm)
        wall = time.perf_counter() - t0
        results.append((n, wall, tm))
        print(f"  N={n}: wall {wall:7.2f}s  compute {tm['compute_s']:7.2f}s  "
              f"drain {tm['fetch_s']:5.2f}s  steps {tm['steps']:3d}  "
              f"edges {edges.n_edges}", flush=True)

    w1 = results[0][1]
    c1 = results[0][2]["compute_s"]
    print("# parallel efficiency (vs N=1; virtual devices share "
          f"{os.cpu_count()} physical cores — see caveat in docstring):",
          flush=True)
    for n, wall, tm in results:
        print(f"  N={n}: wall {w1 / (n * wall):5.2f}  "
              f"compute {c1 / (n * tm['compute_s']):5.2f}  "
              f"steps/step-model "
              f"{tm['steps'] * n / results[0][2]['steps']:.2f}", flush=True)


if __name__ == "__main__":
    main()
