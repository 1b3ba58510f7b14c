"""Checkpoint (de)serialization for keys, SRS, trees and notes.

Role of ``bin/src/parser.rs`` + ark ``CanonicalSerialize`` in the reference:
every artifact of ``compile`` and every store mutated by deposits/withdraws
round-trips through disk.  Device arrays are stored as ``.npz`` with a JSON
sidecar for host metadata; the EPK is recomputed from the PK on load (it is
pure precomputation)."""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..commitment import kzg
from ..curves import make_context
from ..proof_system.keys import POLY_ORDER, ProverKey, VerifierKey
from ..proof_system.proof import Proof, ProofEvaluations


def save_committer_key(path: str, ck: kzg.CommitterKey):
    # uint16: limbs are 16-bit payloads in uint32 lanes; uncompressed:
    # point data is incompressible and savez_compressed costs minutes at
    # SRS scale
    np.savez(
        path, powers=np.asarray(ck.powers, dtype=np.uint16), curve=ck.ctx.name
    )


def load_committer_key(path: str) -> kzg.CommitterKey:
    from ..ops import ec

    data = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=True)
    ctx = make_context(str(data["curve"]))
    return kzg.CommitterKey(
        ctx=ctx,
        powers=jnp.asarray(data["powers"].astype(np.uint32)),
        b3=ec.b3_const(ctx.fq_spec, ctx.curve.b),
    )


def save_kzg_vk(path: str, cvk: kzg.VerifierKeyKZG):
    with open(path, "w") as f:
        json.dump(
            {
                "curve": cvk.ctx.name,
                "g1": [str(int(c)) for c in cvk.g1],
                "g2": [str(cvk.g2[0].a), str(cvk.g2[0].b), str(cvk.g2[1].a), str(cvk.g2[1].b)],
                "tau_g2": [
                    str(cvk.tau_g2[0].a),
                    str(cvk.tau_g2[0].b),
                    str(cvk.tau_g2[1].a),
                    str(cvk.tau_g2[1].b),
                ],
            },
            f,
        )


def load_kzg_vk(path: str) -> kzg.VerifierKeyKZG:
    from ..curves.tower import Fq2

    with open(path) as f:
        d = json.load(f)
    ctx = make_context(d["curve"])
    g2 = d["g2"]
    tg2 = d["tau_g2"]
    return kzg.VerifierKeyKZG(
        ctx=ctx,
        g1=(ctx.Fq(int(d["g1"][0])), ctx.Fq(int(d["g1"][1]))),
        g2=(
            Fq2(ctx.tower, int(g2[0]), int(g2[1])),
            Fq2(ctx.tower, int(g2[2]), int(g2[3])),
        ),
        tau_g2=(
            Fq2(ctx.tower, int(tg2[0]), int(tg2[1])),
            Fq2(ctx.tower, int(tg2[2]), int(tg2[3])),
        ),
    )


def save_prover_key(path: str, pk: ProverKey):
    np.savez(
        path,
        n=pk.n,
        **{name: np.asarray(pk.polys[name], dtype=np.uint16) for name in POLY_ORDER},
    )


def load_prover_key(path: str) -> ProverKey:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    return ProverKey(
        n=int(data["n"]),
        polys={name: jnp.asarray(data[name].astype(np.uint32)) for name in POLY_ORDER},
    )


def save_extended_prover_key(path: str, epk) -> None:
    """EPK checkpoint (reference serializes the EPK too: ``main.rs:108-109``,
    ``parser.rs:5-23``).  Limbs are 16-bit payloads in uint32 lanes; stored
    as uint16 to halve the file."""
    arrays = {f"coset_{k}": np.asarray(v, dtype=np.uint16) for k, v in epk.coset.items()}
    # uncompressed: limb data is uniform-random-looking (compression gains
    # nothing and costs minutes at n=2^18)
    np.savez(
        path,
        n=epk.n,
        x_coset=np.asarray(epk.x_coset, dtype=np.uint16),
        zh_coset_inv=np.asarray(epk.zh_coset_inv, dtype=np.uint16),
        l1_coset=np.asarray(epk.l1_coset, dtype=np.uint16),
        sigma_evals=np.asarray(epk.sigma_evals, dtype=np.uint16),
        roots=np.asarray(epk.roots, dtype=np.uint16),
        q_lookup_evals=np.asarray(epk.q_lookup_evals_host, dtype=np.uint8),
        **arrays,
    )


def load_extended_prover_key(path: str):
    from ..proof_system.keys import ExtendedProverKey

    data = np.load(path if path.endswith(".npz") else path + ".npz")
    u32 = lambda k: jnp.asarray(data[k].astype(np.uint32))
    coset = {
        k[len("coset_"):]: u32(k) for k in data.files if k.startswith("coset_")
    }
    return ExtendedProverKey(
        n=int(data["n"]),
        coset=coset,
        x_coset=u32("x_coset"),
        zh_coset_inv=u32("zh_coset_inv"),
        l1_coset=u32("l1_coset"),
        sigma_evals=u32("sigma_evals"),
        roots=u32("roots"),
        q_lookup_evals_host=[int(v) for v in data["q_lookup_evals"]],
    )


def save_verifier_key(path: str, vk: VerifierKey):
    with open(path, "w") as f:
        json.dump(
            {
                "n": vk.n,
                "pi_pos": vk.pi_pos,
                "domain_gen": str(vk.domain_gen),
                "commitments": {
                    k: None if v is None else [str(v[0]), str(v[1])]
                    for k, v in vk.commitments.items()
                },
            },
            f,
        )


def load_verifier_key(path: str) -> VerifierKey:
    with open(path) as f:
        d = json.load(f)
    return VerifierKey(
        n=d["n"],
        pi_pos=d["pi_pos"],
        domain_gen=int(d["domain_gen"]),
        commitments={
            k: None if v is None else (int(v[0]), int(v[1]))
            for k, v in d["commitments"].items()
        },
    )


def save_json(path: str, obj: dict):
    with open(path, "w") as f:
        json.dump(obj, f)


def load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def proof_to_dict(proof: Proof) -> dict:
    def pt(v):
        return None if v is None else [str(v[0]), str(v[1])]

    ev = proof.evaluations
    return {
        "commitments": {
            k: pt(getattr(proof, k))
            for k in (
                "a_commit", "b_commit", "c_commit", "t_commit", "h1_commit",
                "h2_commit", "z1_commit", "z2_commit", "q_lo_commit",
                "q_mid_commit", "q_hi_commit", "aw_opening", "saw_opening",
            )
        },
        "evaluations": {k: str(getattr(ev, k)) for k in ev.__dataclass_fields__},
    }


def proof_from_dict(d: dict) -> Proof:
    def pt(v):
        return None if v is None else (int(v[0]), int(v[1]))

    c = d["commitments"]
    ev = {k: int(v) for k, v in d["evaluations"].items()}
    return Proof(
        **{k: pt(c[k]) for k in c},
        evaluations=ProofEvaluations(**ev),
    )
