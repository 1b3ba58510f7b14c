"""Serialization round-trips + CLI store flows (host-only parts)."""

import os
import random

from zkt_plonk_tpu.cli import identifier_to_int, main as cli_main
from zkt_plonk_tpu.fields import BN254_FR
from zkt_plonk_tpu.proof_system.proof import Proof, ProofEvaluations
from zkt_plonk_tpu.utils import serialize as ser

P = BN254_FR.modulus


def test_identifier_parsing():
    addr = "0x" + "ab" * 20
    v = identifier_to_int(addr, P)
    assert v == int.from_bytes(bytes.fromhex("ab" * 20), "little")


def test_proof_roundtrip():
    rng = random.Random(70)
    pt = lambda: (rng.randrange(P), rng.randrange(P))
    ev = ProofEvaluations(*[rng.randrange(P) for _ in range(12)])
    proof = Proof(
        a_commit=pt(), b_commit=pt(), c_commit=pt(), t_commit=pt(),
        h1_commit=pt(), h2_commit=pt(), z1_commit=pt(), z2_commit=pt(),
        q_lo_commit=pt(), q_mid_commit=None, q_hi_commit=pt(),
        aw_opening=pt(), saw_opening=pt(), evaluations=ev,
    )
    d = ser.proof_to_dict(proof)
    back = ser.proof_from_dict(d)
    assert back == proof


def test_cli_store_deposit_list(tmp_path, capsys):
    tree = str(tmp_path / "tree")
    notes = str(tmp_path / "notes")
    base = ["--height", "8", "--note-inputs", "1", "--table-size", "8",
            "--poseidon-width", "4"]

    cli_main(base + ["init-store", "-t", tree, "-n", notes])
    addr = "0x" + "12" * 20
    cli_main(base + ["deposit", "-t", tree, "-n", notes, "-i", addr, "-a", "500"])
    cli_main(base + ["deposit", "-t", tree, "-n", notes, "-i", addr, "-a", "300"])
    cli_main(base + ["list-notes", "-n", notes])
    out = capsys.readouterr().out
    assert "note 0" in out and "note 1" in out
    assert "amount = 500" in out and "amount = 300" in out

    # tree store round-trips and has 2 leaves
    from zkt_plonk_tpu.gadgets.merkle_tree import MerkleTreeStore

    store = MerkleTreeStore.from_dict(ser.load_json(tree))
    assert store.next_index == 2
    assert store.root != 0


def test_cli_setup_poseidon(capsys):
    cli_main(["--poseidon-width", "4", "setup-poseidon"])
    out = capsys.readouterr().out
    assert "full rounds = 8" in out
    assert "partial rounds = 56" in out
