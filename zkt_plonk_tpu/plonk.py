"""Top-level ZKTPlonk API: compile / prove / verify.

Rebuild of ``plonk-core/src/plonk.rs:32-125``.  A circuit is any callable
``synthesize(cs)`` (run once in setup mode, once in proving mode); the
instance bundles curve context, transcript factory, committer key and the
compiled keys.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Callable, List, Optional, Protocol

from .commitment import kzg
from .commitment import scheme as scheme_mod
from .cs import ConstraintSystem, LookupTable
from .curves import make_context
from .proof_system.keys import ExtendedProverKey, ProverKey, VerifierKey
from .proof_system.proof import Proof
from .proof_system.prover import Prover
from .proof_system import setup as setup_mod
from .transcript import EthereumTranscript

TRANSCRIPT_LABEL = "ZKT Plonk"


class Circuit(Protocol):
    def synthesize(self, cs: ConstraintSystem) -> None: ...


@dataclass(eq=False)
class CompiledCircuit:
    # keys are scheme-dispatched: KZG (kzg.CommitterKey/VerifierKeyKZG) or
    # IPA (ipa.CommitterKeyIPA, self-dual) — see commitment/scheme.py
    ck: object
    cvk: object
    pk: ProverKey
    epk: Optional[ExtendedProverKey]
    vk: VerifierKey
    _prover: Optional[Prover] = None  # cached jitted round programs


class ZKTPlonk:
    """PLONK+Plookup instance over a named curve (default BN254 + Ethereum
    transcript, the reference CLI default combo)."""

    def __init__(
        self,
        curve: str = "bn254",
        transcript_factory: Callable = EthereumTranscript,
        table: Optional[LookupTable] = None,
    ):
        self.ctx = make_context(curve)
        self.p = self.ctx.curve.fr.modulus
        self.transcript_factory = transcript_factory
        self.table = table if table is not None else LookupTable()

    # ------------------------------------------------------------------

    def compile(
        self,
        circuit: Circuit,
        ck,
        cvk,
        extend: bool = True,
    ) -> CompiledCircuit:
        cs = ConstraintSystem(self.p, setup=True, lookup_table=self.table)
        circuit.synthesize(cs)

        bound = cs.circuit_bound()
        ck_t, cvk_t = scheme_mod.for_key(ck).trim(ck, cvk, bound * 4)
        pk, epk, vk = setup_mod.setup(
            ck_t, cs.setup, self.table, bound, extend=extend
        )
        return CompiledCircuit(ck=ck_t, cvk=cvk_t, pk=pk, epk=epk, vk=vk)

    def prove(
        self,
        compiled: CompiledCircuit,
        circuit: Circuit,
        rng: Optional[random.Random] = None,
    ) -> Proof:
        """Produce a proof (``plonk.rs:94-110`` / ``prove.rs:59-483``).

        DETERMINISTIC-BLINDER MODE: all proof randomness (the ZK blinders,
        ``prove.rs:472-483``) flows through ``rng`` — pass
        ``random.Random(seed)`` and the proof bytes are a pure function of
        (keys, witness, seed).  This is the repo's analog of the
        reference's ``ark_std::test_rng`` proof-comparison mode; exact
        cross-implementation byte identity additionally requires sampling
        blinders identically to the Rust rng, which needs a Rust toolchain
        to generate fixtures (absent here — see BASELINE.md).
        """
        rng = rng if rng is not None else random.Random()
        cs = ConstraintSystem(self.p, setup=False, lookup_table=self.table)
        circuit.synthesize(cs)

        transcript = self.transcript_factory(TRANSCRIPT_LABEL)
        compiled.vk.seed_transcript(transcript)

        if compiled._prover is None:
            compiled._prover = Prover(
                compiled.ck, compiled.pk, compiled.epk, compiled.vk, self.table
            )
        return compiled._prover.prove(cs.proving, transcript, rng)

    def verify(
        self, compiled: CompiledCircuit, proof: Proof, pub_inputs: List[int]
    ) -> None:
        transcript = self.transcript_factory(TRANSCRIPT_LABEL)
        compiled.vk.seed_transcript(transcript)
        proof.verify(compiled.cvk, compiled.vk, transcript, pub_inputs, self.p)
