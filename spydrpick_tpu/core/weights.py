"""Population-structure sample reweighting.

Reference semantics (apegrunt ``cache_sample_weights`` consumed at
src/SpydrPick.cpp:321; rule documented in reference README "Advanced
usage" and the NAR 2019 paper): each sample's weight is

    w_i = 1 / |{ j : similarity(i, j) >= threshold }|

where similarity is the fraction of identical positions between two
samples (the count includes i itself, so every weight is <= 1), and the
threshold is ``--sample-reweighting-threshold`` (default 0.9).  With
``--no-sample-reweighting`` all weights are 1.

TPU-first design: sample-sample identity is one big one-hot matmul —
``sim = (X · X^T) / L`` where ``X`` is the (n_samples, L*5) one-hot
alignment — executed on the MXU in tiles.  The same product yields the
sample-sample Hamming distance matrix dump
(``output_sample_distance_matrix``, src/SpydrPick.cpp:367) for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spydrpick_tpu.core.alignment import Alignment
from spydrpick_tpu.core.alphabet import N_STATES

DEFAULT_REWEIGHTING_THRESHOLD = 0.9


def _one_hot(codes: np.ndarray, dtype=np.float32) -> np.ndarray:
    """(S, L) uint8 -> (S, L*N) one-hot."""
    S, L = codes.shape
    oh = np.zeros((S, L, N_STATES), dtype=dtype)
    np.put_along_axis(oh, codes[:, :, None].astype(np.int64), 1, axis=2)
    return oh.reshape(S, L * N_STATES)


@jax.jit
def _match_counts_tile(xi: jnp.ndarray, xj: jnp.ndarray) -> jnp.ndarray:
    """Number of identical positions between each pair of samples."""
    return jnp.dot(xi, xj.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def sample_match_counts(alignment: Alignment, tile: int = 2048) -> np.ndarray:
    """(S, S) float32 matrix of identical-position counts between samples.

    Identity is computed over the current (filtered) alignment columns on
    the 5-state codes — gap==gap counts as a match, mirroring a Hamming
    distance over the stored states.
    """
    S = alignment.n_samples
    oh = _one_hot(alignment.codes)
    out = np.empty((S, S), dtype=np.float32)
    for i0 in range(0, S, tile):
        xi = jnp.asarray(oh[i0 : i0 + tile])
        for j0 in range(0, S, tile):
            xj = jnp.asarray(oh[j0 : j0 + tile])
            out[i0 : i0 + tile, j0 : j0 + tile] = np.asarray(_match_counts_tile(xi, xj))
    return out


def compute_sample_weights(
    alignment: Alignment,
    threshold: float = DEFAULT_REWEIGHTING_THRESHOLD,
) -> np.ndarray:
    """(S,) float64 weights: 1 / cluster size at the identity threshold."""
    L = alignment.n_loci
    matches = sample_match_counts(alignment)
    similar = matches >= threshold * L  # similarity fraction >= threshold
    cluster_sizes = similar.sum(axis=1)
    return 1.0 / cluster_sizes.astype(np.float64)


def hamming_distance_matrix(alignment: Alignment) -> np.ndarray:
    """(S, S) int64 Hamming distances (for --output-sample-distance-matrix)."""
    matches = sample_match_counts(alignment)
    return (alignment.n_loci - matches).round().astype(np.int64)


def cache_sample_weights(
    alignment: Alignment,
    weights_file: str | None = None,
    no_reweighting: bool = False,
    threshold: float = DEFAULT_REWEIGHTING_THRESHOLD,
) -> Alignment:
    """Attach sample weights to the alignment (src/SpydrPick.cpp:321).

    Priority: explicit file (``--sample-weights``) > disabled
    (``--no-sample-reweighting`` -> all ones) > computed.
    """
    if weights_file is not None:
        from spydrpick_tpu.io.loci import parse_value_list

        w = parse_value_list(weights_file)
        if len(w) != alignment.n_samples:
            raise ValueError(
                f"sample-weights file has {len(w)} values, alignment has "
                f"{alignment.n_samples} samples"
            )
    elif no_reweighting:
        w = np.ones(alignment.n_samples, dtype=np.float64)
    else:
        w = compute_sample_weights(alignment, threshold)
    alignment.weights = w
    return alignment
