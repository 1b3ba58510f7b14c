"""Batched proving over a (data, poly) mesh — BASELINE.json config #5.

The scale-out axis for proof THROUGHPUT is embarrassingly parallel: k
independent witnesses (e.g. a queue of withdraw proofs) are proved
concurrently, each on its own poly-submesh.  A 2-D ``(data, poly)`` mesh
is split into ``data`` row submeshes; every row runs the full
:class:`~zkt_plonk_tpu.parallel.prover.ShardedProver` pipeline (domain
sharding + explicit collectives) for its assigned proofs, and rows run in
parallel host threads so device work on disjoint submeshes overlaps.

The reference has no distributed execution at all (SURVEY.md §2.5); this
is the TPU-native batch layer above its single-proof flow
(``bin/src/main.rs:190-319`` proves one withdraw at a time).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Sequence

import numpy as np
from jax.sharding import Mesh

from .prover import AXIS, ShardedProver


class BatchProver:
    """k independent proofs over a ``(data, poly)`` device mesh.

    mesh2d: a Mesh with axes ("data", "poly"); each data row becomes an
    independent poly submesh with its own ShardedProver (programs compile
    once per submesh shape — identical across rows, so the XLA cache
    makes rows 2..k free).
    """

    def __init__(self, prover, mesh2d: Mesh, msm_groups: int = 0):
        assert mesh2d.axis_names == ("data", "poly"), "mesh axes must be (data, poly)"
        self.rows = []
        devs = mesh2d.devices  # (data, poly) array of devices
        for r in range(devs.shape[0]):
            submesh = Mesh(devs[r], (AXIS,))
            self.rows.append(
                ShardedProver(prover, submesh, msm_groups=msm_groups)
            )

    def prove_batch(
        self, composers: Sequence, transcripts: Sequence, rngs: Sequence
    ) -> List:
        """Prove k witnesses; proof i runs on row ``i % data``.

        Each (composer, transcript, rng) triple is an independent proof
        with its own Fiat-Shamir flow; results preserve input order.
        """
        assert len(composers) == len(transcripts) == len(rngs)
        n_rows = len(self.rows)

        def run_row(r):
            out = []
            for i in range(r, len(composers), n_rows):
                out.append(
                    (i, self.rows[r].prove(composers[i], transcripts[i], rngs[i]))
                )
            return out

        results = [None] * len(composers)
        with ThreadPoolExecutor(max_workers=n_rows) as pool:
            for chunk in pool.map(run_row, range(n_rows)):
                for i, proof in chunk:
                    results[i] = proof
        return results
