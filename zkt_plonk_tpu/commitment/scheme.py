"""Polynomial-commitment scheme abstraction for the proving pipeline.

Role-equivalent of the reference's ``HomomorphicCommitment`` trait
(``plonk-core/src/commitment.rs:10-21``): the PLONK setup/prover/verifier
are generic over the PC scheme, instantiated by KZG10 (``commitment.rs:
24-46``) and IPA (``commitment.rs:49-86``) — the reference's
``batch_test_kzg!``/``batch_test_ipa!`` matrix stamps every pipeline test
over both.

TPU-first shape: the scheme object carries *host orchestration* only; the
heavy work (commit MSMs, the KZG witness-polynomial division) stays on
device in the shared kernels.  Dispatch is by committer/verifier key type
(``for_key``) so the pipeline never needs a scheme string threaded
through.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import ipa, kzg

Point = Optional[Tuple[int, int]]


class KZGScheme:
    """SonicKZG10-style batched openings: one W point per opening set."""

    name = "kzg"

    def committer(self, ck: kzg.CommitterKey):
        return kzg.Committer(ck)

    def trim(self, ck, cvk, degree: int):
        return kzg.trim(ck, cvk, degree)

    def max_degree(self, ck) -> int:
        return ck.max_degree

    def open_batch(self, prover, polys, point: int, eta: int, label: bytes):
        """Device path: eta-fold + synthetic division + commit (one MSM).

        Only the eta powers (one per opened poly, <= 9) are host bigints;
        the O(n) point-power tables build on device inside the jit.
        """
        from ..proof_system.prover import _enc_vec, _powers_arr

        spec = prover.spec
        pt_inv = pow(point, -1, prover.p)
        w = prover._open_batch(
            polys,
            _powers_arr(spec, eta, polys.shape[0], prover.p),
            _enc_vec(spec, [point])[0],
            _enc_vec(spec, [pt_inv])[0],
        )
        return prover.committer.commit_many(w[None])[0]

    def check_batch(
        self, cvk, commitments: Sequence[Point], point: int,
        values: Sequence[int], opening, eta: int, label: bytes,
    ) -> bool:
        return kzg.check(cvk, commitments, point, values, opening, eta)


class IPAScheme:
    """Bulletproofs-style inner-product openings (transparent setup)."""

    name = "ipa"

    class _Committer:
        def __init__(self, ck: ipa.CommitterKeyIPA):
            self.ck = ck
            self._fr_spec = ck.ctx.fr_spec

        def commit_many(self, polys) -> List[Point]:
            import jax

            use_device = jax.default_backend() != "cpu"
            out = []
            for i in range(len(polys)):
                coeffs = self._fr_spec.decode(np.asarray(polys[i]))
                pt = ipa.commit(self.ck, coeffs, device=use_device)
                out.append(None if pt is None else (int(pt[0]), int(pt[1])))
            return out

    def committer(self, ck):
        return IPAScheme._Committer(ck)

    def trim(self, ck, cvk, degree: int):
        if degree > ck.max_degree:
            raise ValueError(
                f"IPA key supports degree {ck.max_degree}, need {degree}"
            )
        return ck, cvk

    def max_degree(self, ck) -> int:
        return ck.max_degree

    def open_batch(self, prover, polys, point: int, eta: int, label: bytes):
        coeff_rows = np.asarray(polys)
        spec = prover.spec
        host_polys = [spec.decode(coeff_rows[i]) for i in range(len(coeff_rows))]
        proof, _v = ipa.open_batch(prover.ck, host_polys, point, eta, label=label)
        return proof

    def check_batch(
        self, cvk, commitments, point, values, opening, eta, label: bytes
    ) -> bool:
        Fq = cvk.ctx.Fq
        pts = [
            None if c is None else (Fq(c[0]), Fq(c[1])) for c in commitments
        ]
        return ipa.check_batch(cvk, pts, point, list(values), eta, opening, label=label)


_KZG = KZGScheme()
_IPA = IPAScheme()


def for_key(key) -> object:
    """Scheme dispatch by committer/verifier key type."""
    if isinstance(key, (kzg.CommitterKey, kzg.VerifierKeyKZG)):
        return _KZG
    if isinstance(key, ipa.CommitterKeyIPA):
        return _IPA
    raise TypeError(f"unknown polynomial-commitment key type {type(key)!r}")
