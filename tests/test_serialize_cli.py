"""Serialization round-trips + CLI store flows (host-only parts)."""

import os
import random

import pytest

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


def test_cli_full_withdraw_flow(tmp_path, capsys):
    """The complete CLI application flow at a shrunken instance config:
    compile -> init-store -> deposit x2 -> prove-withdraw -> verify ->
    store update (``bin/src/main.rs:190-319``).  Slow (real prove on the
    CPU backend) but the only end-to-end coverage of cmd_prove_withdraw."""
    d = str(tmp_path)
    paths = {
        "ck": f"{d}/ck", "cvk": f"{d}/cvk", "pk": f"{d}/pk", "vk": f"{d}/vk",
        "tree": f"{d}/tree", "notes": f"{d}/notes", "proof": f"{d}/proof",
        "epk": f"{d}/epk",
    }
    # width 4: the leaf hash takes 3 inputs (identifier, amount, commitment)
    base = ["--height", "4", "--note-inputs", "1", "--table-size", "8",
            "--poseidon-width", "4"]
    addr = "0x" + "12" * 20

    cli_main(base + ["compile", "-d", str(1 << 16),
                     "--ck", paths["ck"], "--cvk", paths["cvk"],
                     "--pk", paths["pk"], "--vk", paths["vk"],
                     "--epk", paths["epk"]])
    cli_main(base + ["init-store", "-t", paths["tree"], "-n", paths["notes"]])
    cli_main(base + ["deposit", "-t", paths["tree"], "-n", paths["notes"],
                     "-i", addr, "-a", "500"])
    cli_main(base + ["deposit", "-t", paths["tree"], "-n", paths["notes"],
                     "-i", addr, "-a", "300"])
    cli_main(base + [
        "prove-withdraw",
        "--ck", paths["ck"], "--cvk", paths["cvk"],
        "--pk", paths["pk"], "--vk", paths["vk"], "--epk", paths["epk"],
        "-t", paths["tree"], "-n", paths["notes"],
        "-x", "0", "-s", addr, "-i", addr, "-a", "120",
        "--seed", "42", "--proof-out", paths["proof"],
    ])
    out = capsys.readouterr().out
    assert "verifying finished" in out

    # stores updated: spent note removed, change note appended, tree grown
    from zkt_plonk_tpu.gadgets.merkle_tree import MerkleTreeStore
    from zkt_plonk_tpu.gadgets.note import Notes

    store = MerkleTreeStore.from_dict(ser.load_json(paths["tree"]))
    assert store.next_index == 3  # 2 deposits + 1 change leaf
    notes = Notes.from_dict(ser.load_json(paths["notes"]))
    assert len(notes.notes) == 2
    amounts = sorted(n.amount for n in notes.notes)
    assert amounts == [300, 380]  # unspent 300 + change 500-120

    proof_dict = ser.load_json(paths["proof"])
    back = ser.proof_from_dict(proof_dict)
    assert back.a_commit is not None
