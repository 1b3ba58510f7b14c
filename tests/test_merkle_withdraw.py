"""Merkle PoE gadget + withdraw-circuit gate-level tests (host harness)."""

import random

from zkt_plonk_tpu.cs import LookupTable, lt
from zkt_plonk_tpu.cs.helper import test_gate_constraints as run_gate_constraints
from zkt_plonk_tpu.fields import BN254_FR
from zkt_plonk_tpu.gadgets.merkle_tree import MerkleTree, MerkleTreeStore
from zkt_plonk_tpu.hashing import Poseidon, bn254_constants
from zkt_plonk_tpu.hashing.merkle import PoECircuit, native_merkle_proof

P = BN254_FR.modulus
HEIGHT = 8


def test_poe_circuit_matches_native():
    const = bn254_constants(3)
    rng = random.Random(60)
    leaf = rng.randrange(P)
    witness = [(rng.random() < 0.5, rng.randrange(P)) for _ in range(HEIGHT)]
    native = native_merkle_proof(Poseidon(const, native=True), witness, leaf)
    root = native[-1]
    leaf_index = sum(1 << i for i, (b, _) in enumerate(witness) if b)

    def process(cs):
        hasher = Poseidon(const, native=False)
        circuit = PoECircuit(
            height=HEIGHT,
            leaf_index=leaf_index,
            path_elements=[n for _, n in witness],
        )
        leaf_var = lt(cs.assign_variable(leaf))
        root_var, _ = circuit.synthesize(cs, hasher, leaf_var)
        return [(root_var, root)]

    run_gate_constraints(P, process, [], LookupTable())


def test_merkle_tree_paths_roundtrip():
    const = bn254_constants(3)
    hasher = Poseidon(const, native=True)
    tree = MerkleTree(hasher, MerkleTreeStore(height=HEIGHT))
    rng = random.Random(61)

    leaves = [rng.randrange(P) for _ in range(5)]
    for leaf in leaves:
        tree.add_leaf(leaf)

    for idx, leaf in enumerate(leaves):
        path = tree.merkle_path(idx)
        witness = [((idx >> layer) & 1 == 1, node) for layer, node in enumerate(path)]
        chain = native_merkle_proof(Poseidon(const, native=True), witness, leaf)
        assert chain[-1] == tree.root


def test_withdraw_circuit_gates():
    from zkt_plonk_tpu.circuits.withdraw import WithdrawCircuit

    const = bn254_constants(4)
    hasher = Poseidon(const, native=True)
    rng = random.Random(62)
    inputs = 2

    identifiers = [rng.randrange(1, 1 << 60) for _ in range(inputs)]
    table = LookupTable(identifiers + [7, 8], size=16)

    tree = MerkleTree(hasher, MerkleTreeStore(height=HEIGHT))
    secrets = [rng.randrange(1, P) for _ in range(inputs)]
    amounts = [100, 250]

    leaf_indices = []
    for ident, amount, secret in zip(identifiers, amounts, secrets):
        commitment = hasher.hash(None, [secret])
        leaf = hasher.hash(None, [ident, amount, commitment])
        leaf_indices.append(tree.add_leaf(leaf))

    withdraw_amount = 120
    new_secret = rng.randrange(1, P)
    new_identifier = identifiers[0]
    amount_out = sum(amounts) - withdraw_amount
    new_commitment = hasher.hash(None, [new_secret])
    new_leaf = hasher.hash(None, [new_identifier, amount_out, new_commitment])

    nullifiers = [hasher.hash(None, [pow(s, -1, P)]) for s in secrets]

    def make_circuit():
        return WithdrawCircuit(
            constants=const,
            height=HEIGHT,
            secrets=secrets,
            identifiers=identifiers,
            amount_inputs=amounts,
            poe_circuits=[
                PoECircuit(
                    height=HEIGHT,
                    leaf_index=idx,
                    path_elements=tree.merkle_path(idx),
                )
                for idx in leaf_indices
            ],
            root=tree.root,
            new_secret=new_secret,
            new_identifier=new_identifier,
            withdraw_amount=withdraw_amount,
        )

    pub_inputs = [tree.root] + nullifiers + [withdraw_amount, new_identifier, new_leaf]

    def process(cs):
        make_circuit().synthesize(cs)
        return []

    run_gate_constraints(P, process, pub_inputs, table)
