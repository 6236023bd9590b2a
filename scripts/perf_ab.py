"""In-process A/B of two sweep-schedule variants through the REAL
production sweep.

The axon tunnel's throughput drifts up to 2x between sessions, so the
only trustworthy comparison interleaves both variants within ONE
process (see ARCHITECTURE.md "tunnel-noise methodology").  Both engines
share one set of device-resident alignment tensors (MIEngine _prebuilt)
so HBM holds a single one-hot; variant B is expressed as SweepStatics
field overrides, so anything captured statically by the jitted programs
(block sizes, schedule switches) can be A/B'd without re-uploading.

Usage:
  python scripts/perf_ab.py [S] [L] [rounds] key=value [key=value ...]

e.g.  python scripts/perf_ab.py 3000 30720 4 pallas_bj=256

History: retired SPYDRPICK_PALLAS_ROWCALL (whole-row pallas_call) lost
its interleaved A/B 2026-08-19 — compute 2.04 s vs 1.77 s per-tile at
the 30k config, consistent across 4 interleaved rounds — and was
removed; the round-3 single-process "win" was tunnel noise.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spydrpick_tpu.core.alignment import Alignment  # noqa: E402
from spydrpick_tpu.engine.solver import EngineConfig, MIEngine  # noqa: E402


def parse_override(tok: str):
    key, _, val = tok.partition("=")
    for cast in (int, float):
        try:
            return key, cast(val)
        except ValueError:
            pass
    if val in ("True", "False"):
        return key, val == "True"
    return key, val


def main():
    args = sys.argv[1:]
    S = int(args[0]) if len(args) > 0 else 3000
    L = int(args[1]) if len(args) > 1 else 30720
    rounds = int(args[2]) if len(args) > 2 else 4
    overrides = dict(parse_override(t) for t in args[3:] if "=" in t)
    if not overrides:
        print("no statics overrides given — nothing to A/B", file=sys.stderr)
        sys.exit(2)
    print(f"# devices {jax.devices()}  S={S} L={L}  B: {overrides}", flush=True)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    al = Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(S)],
        id_string="ab",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=(None if os.environ.get("BENCH_UNIT_WEIGHTS") == "1"
                 else rng.random(S) * 0.9 + 0.1),
    )
    cfg = EngineConfig(tile=512, rows_per_dispatch=8,
                       onehot_storage="dense", wog_fetch="outliers")
    # "cfg_"-prefixed overrides patch the CONFIG of engine B instead of
    # its SweepStatics (host-side knobs like rows_per_dispatch live
    # there); device data stays shared either way
    cfg_ov = {k[4:]: v for k, v in overrides.items() if k.startswith("cfg_")}
    st_ov = {k: v for k, v in overrides.items() if not k.startswith("cfg_")}
    eng_a = MIEngine(al, cfg)
    eng_b = MIEngine(al, dataclasses.replace(cfg, **cfg_ov), _prebuilt=(
        eng_a.data, dataclasses.replace(eng_a.statics, **st_ov)))
    print("# engines ready (shared device data)", flush=True)

    ii = rng.integers(0, L, 20000)
    jj = rng.integers(0, L, 20000)
    keep = ii != jj
    sample = eng_a.pair_mi(np.minimum(ii, jj)[keep],
                           np.maximum(ii, jj)[keep])
    target_frac = min(1.0, (100 * L) / (L * (L - 1) / 2))
    threshold = float(np.quantile(sample, 1 - target_frac))
    print(f"# threshold {threshold:.6f}", flush=True)

    # warm-up (compile) + cross-check the two variants agree.  Value-
    # shifting overrides (int8_mode, precision switches) may flip edges
    # whose MI sits within the variants' value jitter of the threshold —
    # and on random data the near-threshold density is enormous (every
    # pair's MI is at the noise floor), so the flip COUNT is data- not
    # correctness-determined.  The correctness conditions are:
    #   (1) MI values agree tightly on the common edges, and
    #   (2) every flipped edge lies inside that value band of the
    #       threshold (it flipped because of jitter, not a wrong value).
    e_a = eng_a.sweep(threshold)
    e_b = eng_b.sweep(threshold)
    assert abs(e_a.n_edges - e_b.n_edges) <= max(2, e_a.n_edges // 20), (
        e_a.n_edges, e_b.n_edges)
    sa = set(zip(e_a.ipos, e_a.jpos))
    sb = set(zip(e_b.ipos, e_b.jpos))
    ma = {(i, j): m for i, j, m in zip(e_a.ipos, e_a.jpos, e_a.mi)}
    mb = {(i, j): m for i, j, m in zip(e_b.ipos, e_b.jpos, e_b.mi)}
    common = sa & sb
    dmax = max(abs(ma[k] - mb[k]) for k in common) if common else 0.0
    # a systematic value shift must fail outright, not widen its own
    # flip band: dmax itself is capped at an absolute jitter bound
    assert dmax < 1e-3, f"variant B shifts MI values (dmax {dmax:.3e})"
    band = min(max(4.0 * dmax, 1e-6), 1e-3)
    stray = [k for k in sa ^ sb
             if abs((ma[k] if k in ma else mb[k]) - threshold) > band]
    assert not stray, (len(stray), stray[:5], band)
    print(f"# edges A={e_a.n_edges} B={e_b.n_edges} "
          f"(symdiff {len(sa ^ sb)}, all within {band:.2e} of threshold), "
          f"max |mi_A - mi_B| = {dmax:.3e}",
          flush=True)

    times = {"A": [], "B": []}
    comp = {"A": [], "B": []}
    for r in range(rounds):
        for name, eng in (("A", eng_a), ("B", eng_b)):
            p: dict = {}
            t0 = time.perf_counter()
            eng.sweep(threshold, timings=p)
            dt = time.perf_counter() - t0
            times[name].append(dt)
            comp[name].append(p["compute_s"])
            print(f"# round {r + 1}/{rounds} {name}: sweep {dt:.3f}s "
                  f"compute {p['compute_s']:.3f}s sync {p['sync_wait_s']:.3f}s",
                  flush=True)
    pairs = L * (L - 1) / 2
    for name in ("A", "B"):
        ts, cs = times[name], comp[name]
        print(f"{name}: sweeps " + " ".join(f"{t:.3f}" for t in ts)
              + f"  min {min(ts):.3f}s ({pairs / min(ts) / 1e6:.1f}M pairs/s)"
              + f"  compute min {min(cs):.3f}s", flush=True)


if __name__ == "__main__":
    main()
