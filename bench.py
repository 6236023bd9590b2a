"""Benchmark: all-pairs MI sweep throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Config: the BASELINE.md "medium" shape (~3k samples x ~30k filtered
columns), overridable via BENCH_SAMPLES / BENCH_LOCI / BENCH_TILE.
Further knobs: BENCH_ROWS (rows/dispatch), BENCH_DEPTH (counts-sync
pipeline depth), BENCH_ONEHOT (dense|codes), BENCH_WOG_FETCH,
BENCH_PALLAS_COMPACT, BENCH_ROW_WINDOW (j-window width; 0 = auto);
engine env: SPYDRPICK_PALLAS_ROUTE=1 (VMEM
routing kernel, opt-in until hardware-validated), SPYDRPICK_PALLAS_BJ.
The metric is column-pairs/s through the REAL production sweep
(crosstable matmuls + dual-variant entropy + colmax + on-device edge
store) at a threshold retaining ~100*L edges — the reference's
auto-threshold target (src/SpydrPick.cpp:338-339).

vs_baseline: the reference repo publishes no numbers and its binary
cannot be built here (BASELINE.md), so the denominator is MEASURED:
this repo's own engine on XLA-CPU (one-hot crosstable matmuls +
vectorised dual entropy, XLA multi-threaded — scripts/cpu_baseline.py)
ran 574,210 pairs/s on this 4-core host; projected linearly to the
BASELINE.md 64-core reference node = 9.19e6 pairs/s.  (The round-1
back-of-envelope estimate for the reference binary itself was 3e7;
it is reported alongside in the config blob.)  vs_baseline >= 10
meets the north-star "10x a 64-core CPU node".
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_CPU_PAIRS_PER_S = 9.19e6   # measured, see scripts/cpu_baseline.py
BASELINE_CPU_ESTIMATE = 3.0e7       # round-1 reference-binary estimate


def supervise() -> int:
    """Run the real bench in a child process with stall detection.

    The TPU tunnel in this environment wedges nondeterministically at
    init/compile (child blocks on a futex with ~zero CPU and ignores
    SIGTERM); retry with backoff and forward the JSON line.
    """
    stall_s = int(os.environ.get("BENCH_STALL", 420))

    def relay_up() -> bool:
        """The axon tunnel relay listens on 8082; connection refused
        means the relay died — clients would hang forever in
        jax.devices(), so wait for it instead of burning attempts."""
        import socket

        s = socket.socket()
        s.settimeout(3)
        try:
            s.connect(("127.0.0.1", 8082))
            return True
        except OSError:
            return False
        finally:
            s.close()

    for attempt in range(1, 7):
        if attempt <= 4 and not relay_up():
            # ADVISORY wait: a refused port usually means the relay died
            # (children would hang in jax.devices() and burn the stall
            # watchdog), but a non-tunnel TPU setup has no relay at all —
            # so wait a bounded time on early attempts, then proceed and
            # let the stall watchdog arbitrate.  (Outages of 45+ min
            # have been observed; four 20-min waits ride those out.)
            print(f"bench: tunnel relay port closed (attempt {attempt}); "
                  "waiting up to 20 min", file=sys.stderr)
            for _ in range(20):
                time.sleep(60)
                if relay_up():
                    break
        env = dict(os.environ, BENCH_INNER="1")
        proc = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
        )
        t_last = time.time()

        import threading

        lines: list[str] = []

        def _reader():
            for line in proc.stdout:
                text = line.decode(errors="replace")
                lines.append(text)
                if text.startswith("#"):
                    print(text, end="", file=sys.stderr)  # forward heartbeats

        th = threading.Thread(target=_reader, daemon=True)
        th.start()
        seen = 0
        last_cpu = 0.0

        def _cpu():
            try:
                with open(f"/proc/{proc.pid}/stat") as f:
                    parts = f.read().split()
                return (int(parts[13]) + int(parts[14])) / 100.0
            except OSError:
                return None

        while proc.poll() is None:
            time.sleep(5)
            cpu = _cpu()
            # liveness = new output OR real CPU burn (long compiles emit
            # nothing; a wedged child trickles <0.1 s CPU per window)
            if len(lines) > seen or (cpu is not None and cpu - last_cpu > 0.4):
                seen = len(lines)
                t_last = time.time()
            if cpu is not None:
                last_cpu = cpu
            if time.time() - t_last > stall_s:
                proc.kill()
                print(f"bench: child stalled (attempt {attempt}); retrying",
                      file=sys.stderr)
                time.sleep(30 * attempt)
                break
        else:
            th.join(timeout=5)
            for line in lines:
                if line.startswith("{"):
                    print(line, end="" if line.endswith("\n") else "\n")
                    return 0
            # child exited without a result: real error — show and retry
            print(f"bench: child exited rc={proc.returncode} without result",
                  file=sys.stderr)
            time.sleep(15)
    print("bench: giving up after 6 attempts", file=sys.stderr)
    return 1


def main():
    import jax

    # persistent compile cache: retries after tunnel wedges resume
    # compiled instead of paying multi-minute compiles again
    jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spydrpick_tpu.core.alignment import Alignment
    from spydrpick_tpu.engine.solver import EngineConfig, MIEngine

    S = int(os.environ.get("BENCH_SAMPLES", 3000))
    L = int(os.environ.get("BENCH_LOCI", 30720))
    tile = int(os.environ.get("BENCH_TILE", 512))
    compact = os.environ.get("BENCH_PALLAS_COMPACT", "auto")
    rows_per_dispatch = int(os.environ.get("BENCH_ROWS", 8))

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    al = Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(S)],
        id_string="bench",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=(None if os.environ.get("BENCH_UNIT_WEIGHTS") == "1"
                 else rng.random(S) * 0.9 + 0.1),
    )
    print("# data built", flush=True)
    engine = MIEngine(
        al,
        EngineConfig(tile=tile, use_pallas_compact=compact,
                     rows_per_dispatch=rows_per_dispatch,
                     pipeline_depth=int(os.environ.get("BENCH_DEPTH", 2)),
                     onehot_storage=os.environ.get("BENCH_ONEHOT", "auto"),
                     row_window=int(os.environ.get("BENCH_ROW_WINDOW", 0)),
                     mxu_int8=os.environ.get("BENCH_MXU_INT8", "auto"),
                     wog_fetch=os.environ.get("BENCH_WOG_FETCH", "outliers")),
    )
    print("# engine ready", flush=True)

    def progress(lo, hi, n, dt):
        print(f"# rows {lo}-{hi} ({n} edges, {dt:.2f}s)", flush=True)

    # threshold retaining ~100*L of the L^2/2 pairs, estimated from a
    # sample (the production tournament does the same, SpydrPick.hpp:284)
    ii = rng.integers(0, L, 20000)
    jj = rng.integers(0, L, 20000)
    keep = ii != jj
    sample = engine.pair_mi(np.minimum(ii, jj)[keep], np.maximum(ii, jj)[keep])
    target_frac = min(1.0, (100 * L) / (L * (L - 1) / 2))
    threshold = float(np.quantile(sample, 1 - target_frac))
    print(f"# threshold {threshold:.6f}", flush=True)

    t0 = time.perf_counter()
    edges = engine.sweep(threshold, progress=progress)
    compile_and_run = time.perf_counter() - t0
    print(f"# first sweep {compile_and_run:.1f}s", flush=True)

    # the tunnel's throughput swings +/-25% (sometimes 2x) run to run
    # (d2h drains share the link with dispatch commands); sweep
    # ADAPTIVELY: at least BENCH_SWEEPS runs, continuing until the two
    # fastest agree within 4% (evidence the min is the machine's number,
    # not one lucky/unlucky window), capped at BENCH_SWEEPS_MAX.  The
    # min and the full series are recorded in the result blob;
    # production PCIe/ICI attachments do not have this variance.
    n_min = int(os.environ.get("BENCH_SWEEPS", 7))
    n_max = int(os.environ.get("BENCH_SWEEPS_MAX", 20))
    runs = []
    phases: dict = {}
    while True:
        p: dict = {}
        t0 = time.perf_counter()
        edges = engine.sweep(threshold, progress=progress, timings=p)
        t = time.perf_counter() - t0
        runs.append(t)
        if t <= min(runs):
            phases = p
        lo = sorted(runs)[:2]
        stable = len(runs) >= max(2, n_min) and lo[1] / lo[0] < 1.04
        print(f"# sweep {len(runs)}: {t:.3f}s (best {lo[0]:.3f}s, "
              f"{'stable' if stable else 'unstable'}) phases {p}", flush=True)
        if stable or len(runs) >= n_max:
            break
    dt = min(runs)
    runs = [round(t, 3) for t in runs]

    # --- end-to-end pipeline phases (tournament + sweep + ARACNE +
    # writers on the same alignment; reference UX is per-stage cputimer
    # prints, src/SpydrPick.cpp:157-161) ---
    e2e: dict = {}
    if os.environ.get("BENCH_E2E", "1") == "1":
        import tempfile

        from spydrpick_tpu.io.fasta import write_fasta
        from spydrpick_tpu.pipeline import PipelineOptions, run_pipeline

        with tempfile.TemporaryDirectory() as td:
            print("# e2e: writing fasta", flush=True)
            fasta = os.path.join(td, "bench.fasta")
            write_fasta(fasta, al)
            wfile = os.path.join(td, "bench.weights")
            with open(wfile, "w") as f:
                f.write("\n".join(f"{x:.9f}" for x in (
                    al.weights if al.weights is not None else np.ones(S))))
            # two passes: the first pays one-time costs a production
            # deployment does not (tournament/pairs XLA compile or
            # persistent-cache deserialize); the reference binary has no
            # compile stage, so the WARM pass is the comparable
            # end-to-end number.  Both totals are recorded.
            tm_cold: dict = {}
            print("# e2e: running pipeline (cold, auto threshold)",
                  flush=True)
            t0 = time.perf_counter()
            run_pipeline(PipelineOptions(
                alignmentfile=fasta, mi_threshold=-1.0, seed=1,
                sample_weights=wfile, tile=tile,
                output_dir=os.path.join(td, "out_cold"),
            ), timings=tm_cold)
            cold_total = time.perf_counter() - t0
            tm: dict = {}
            print("# e2e: running pipeline (warm)", flush=True)
            res = run_pipeline(PipelineOptions(
                alignmentfile=fasta, mi_threshold=-1.0, seed=1,
                sample_weights=wfile, tile=tile,
                output_dir=os.path.join(td, "out"),
            ), timings=tm)
            e2e = {k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in tm.items() if not isinstance(v, dict)}
            e2e["cold_total_s"] = round(cold_total, 3)
            e2e["cold_threshold_s"] = round(
                tm_cold.get("threshold_s", 0.0), 3)
            e2e["cold_sweep_s"] = round(tm_cold.get("sweep_s", 0.0), 3)
            e2e["sweep_phases"] = {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in tm.get("sweep_phases", {}).items()}
            e2e["aracne_phases"] = {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in tm.get("aracne_phases", {}).items()}
            e2e["edges"] = int(res.edges.n_edges)
            e2e["mi_threshold"] = round(res.mi_threshold, 6)
            print(f"# e2e: {e2e}", flush=True)

    pairs = L * (L - 1) / 2
    pairs_per_s = pairs / dt
    result = {
        "metric": "mi_column_pairs_per_s",
        "value": round(pairs_per_s, 1),
        "unit": "column-pairs/s/chip",
        "vs_baseline": round(pairs_per_s / BASELINE_CPU_PAIRS_PER_S, 3),
        "config": {
            "baseline_denominator": BASELINE_CPU_PAIRS_PER_S,
            "vs_ref_estimate": round(pairs_per_s / BASELINE_CPU_ESTIMATE, 3),
            "samples": S, "loci": L, "tile": tile,
            "backend": jax.default_backend(),
            "int8_mode": engine.statics.int8_mode,
            "pallas_bs": engine.statics.pallas_bs,
            "rows_per_dispatch": rows_per_dispatch,
            "threshold": round(threshold, 6),
            "edges": int(edges.n_edges),
            "sweep_seconds": round(dt, 3),
            "sweep_method": (
                f"min of {len(runs)} sweeps (adaptive: best two within "
                f"4% or cap {n_max})"),
            "sweep_seconds_all": runs,
            "first_run_seconds": round(compile_and_run, 3),
            "phases": {k: (round(v, 3) if isinstance(v, float) else v)
                       for k, v in phases.items()},
            "end_to_end_s": e2e,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") == "1":
        sys.exit(main())
    sys.exit(supervise())
