"""Regenerate the golden end-to-end fixture.

Builds a small alignment with planted couplings and gaps, runs the FULL
CLI on CPU, and freezes every output file under tests/golden/expected/.
test_golden.py asserts byte-identity against these files, locking the
whole output surface (couplings format README.md:60-62, outliers format
SpydrPick.hpp:89-129) across engine-perf churn.

Run from the repo root:  python tests/golden/make_golden.py
"""

import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))


def build_alignment_fasta(path: str) -> None:
    """60 samples x 200 loci: planted couplings, gaps, low-MAF columns,
    duplicate samples (exercises sample reweighting)."""
    from spydrpick_tpu.core.alignment import Alignment
    from spydrpick_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(1234)
    S, L = 60, 200
    base = rng.integers(0, 4, size=(1, L))
    codes = np.repeat(base, S, axis=0)
    mut = rng.random((S, L)) < 0.20
    codes[mut] = rng.integers(0, 4, size=int(mut.sum()))
    # planted couplings: copies with small noise
    codes[:, 150] = codes[:, 20]
    codes[:, 151] = codes[:, 21]
    flip = rng.random(S) < 0.05
    codes[flip, 151] = rng.integers(0, 4, size=int(flip.sum()))
    # a monomorphic and a low-MAF column (filtered out)
    codes[:, 100] = 2
    codes[:, 101] = 3
    codes[0, 101] = 1
    # gaps: a gappy stripe plus a column over the gap threshold
    codes[rng.random((S, L)) < 0.04] = 4
    codes[: int(0.3 * S), 102] = 4
    # duplicate samples -> reweighting has an effect
    codes[50:] = codes[:10]
    write_fasta(
        path,
        Alignment(
            codes=codes.astype(np.uint8),
            sample_names=[f"sample_{i}" for i in range(S)],
            id_string="golden",
            translation=np.arange(L, dtype=np.int64),
            n_original_positions=L,
        ),
    )


def main() -> None:
    from spydrpick_tpu.cli import main as cli_main

    fasta = os.path.join(HERE, "golden.fasta")
    build_alignment_fasta(fasta)

    expected = os.path.join(HERE, "expected")
    if os.path.isdir(expected):
        shutil.rmtree(expected)
    os.makedirs(expected)

    tmp = tempfile.mkdtemp()
    rc = cli_main([
        fasta,
        "--seed", "7",
        "--ld-threshold", "10",
        "--mi-values", "1500",
        "--output-state-frequencies",
        "--output-sample-weights",
        "--output-dir", tmp,
    ])
    assert rc in (0, None), rc
    for name in sorted(os.listdir(tmp)):
        shutil.copy(os.path.join(tmp, name), os.path.join(expected, name))
        print("froze", name)
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
