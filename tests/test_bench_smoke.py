"""bench.py inner-path smoke: the driver's headline artifact must not
rot while engine options churn.  Runs the real bench main() on CPU at a
tiny shape and validates the JSON result line."""

import json
import os
import subprocess
import sys


def test_bench_inner_smoke(tmp_path):
    env = dict(
        os.environ,
        BENCH_INNER="1",
        BENCH_SAMPLES="40",
        BENCH_LOCI="512",
        BENCH_TILE="64",
        BENCH_DEPTH="2",
        BENCH_ONEHOT="codes",
        JAX_PLATFORMS="cpu",
    )
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    # sitecustomize force-overrides jax_platforms; go through a stub
    # that pins CPU before importing bench (same dance as the CLI docs)
    stub = tmp_path / "run_bench.py"
    stub.write_text(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import bench\n"
        "import sys\n"
        "sys.exit(bench.main())\n"
    )
    out = subprocess.run(
        [sys.executable, "-u", str(stub)],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=env["PYTHONPATH"].split(os.pathsep)[0],
    )
    assert out.returncode in (0, None), out.stdout + out.stderr
    result_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert result_lines, out.stdout
    res = json.loads(result_lines[-1])
    assert res["metric"] == "mi_column_pairs_per_s"
    assert res["value"] > 0
    assert res["unit"] == "column-pairs/s/chip"
    assert "vs_baseline" in res
    assert res["config"]["edges"] > 0
    # end-to-end phase breakdown (tournament/sweep/aracne/writers)
    e2e = res["config"]["end_to_end_s"]
    for k in ("preprocess_s", "threshold_s", "sweep_s", "aracne_s",
              "write_s", "total_s"):
        assert k in e2e, e2e
    assert e2e["edges"] > 0
