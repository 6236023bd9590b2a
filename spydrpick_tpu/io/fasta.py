"""FASTA alignment reader/writer.

Replaces the role of apegrunt's FASTA parser (consumed via
``apegrunt::get_alignments`` at src/SpydrPick.cpp:163).  Semantics
(reference README.md:42): case-insensitive; A/C/G/T are four
categories, every other symbol maps to the gap category.

The parser is vectorised NumPy over the raw file bytes: it locates
record boundaries with a single scan and decodes all sequence bytes
through a 256-entry lookup table — no per-character Python loop.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

from spydrpick_tpu.core.alignment import Alignment
from spydrpick_tpu.core.alphabet import decode_codes, encode_bytes


def read_fasta(
    path: str | os.PathLike,
    mappings: np.ndarray | None = None,
    genome_size: int | None = None,
) -> Alignment:
    """Parse a FASTA file into an :class:`Alignment`.

    ``mappings``: optional per-column original-position indices
    (``--mappings-list``, reference README "Advanced usage").
    ``genome_size``: optional explicit genome size (``--genome-size``).
    """
    path = pathlib.Path(path)
    raw = path.read_bytes()
    if not raw.strip():
        raise ValueError(f"{path}: empty FASTA file")

    names: list[str] = []
    seqs: list[np.ndarray] = []
    # Split on '>' record starts. Records are header line + sequence lines.
    chunks = raw.split(b">")
    for chunk in chunks:
        if not chunk.strip():
            continue
        nl = chunk.find(b"\n")
        if nl < 0:
            raise ValueError(f"{path}: malformed FASTA record (no sequence)")
        header = chunk[:nl].strip().decode("utf-8", errors="replace")
        body = chunk[nl + 1 :]
        arr = np.frombuffer(body, dtype=np.uint8)
        # drop whitespace bytes (\n \r \t space)
        keep = (arr != 0x0A) & (arr != 0x0D) & (arr != 0x09) & (arr != 0x20)
        names.append(header.split()[0] if header else f"seq{len(names)}")
        seqs.append(encode_bytes(arr[keep]))

    if not seqs:
        raise ValueError(f"{path}: no sequences found")
    widths = {len(s) for s in seqs}
    if len(widths) != 1:
        raise ValueError(f"{path}: unaligned sequences (widths {sorted(widths)})")
    codes = np.vstack(seqs)
    n_loci = codes.shape[1]

    if mappings is not None:
        mappings = np.asarray(mappings, dtype=np.int64)
        if len(mappings) != n_loci:
            raise ValueError(
                f"mappings list has {len(mappings)} entries but alignment has {n_loci} columns"
            )
        translation = mappings
        n_original = int(mappings.max()) + 1
    else:
        translation = np.arange(n_loci, dtype=np.int64)
        n_original = n_loci
    if genome_size is not None:
        n_original = int(genome_size)

    return Alignment(
        codes=codes,
        sample_names=names,
        id_string=path.name.split(".")[0],
        translation=translation,
        n_original_positions=n_original,
    )


def write_fasta(path: str | os.PathLike, alignment: Alignment, width: int = 60) -> None:
    """Write an alignment back to FASTA (apegrunt ``output_alignment``,
    used for --output-alignment / outlier-node dumps, SpydrPick.cpp:173,501)."""
    with open(path, "wb") as f:
        for name, row in zip(alignment.sample_names, alignment.codes):
            f.write(b">" + name.encode() + b"\n")
            seq = decode_codes(row)
            for off in range(0, len(seq), width):
                f.write(seq[off : off + width] + b"\n")
