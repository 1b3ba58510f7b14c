"""Full withdraw-proof E2E benchmark (BASELINE.md target config #4).

Reference default config (bin/Cargo.toml default features,
bin/src/instance.rs:41): HEIGHT=48, NOTE_INPUTS=3, TABLE_SIZE=1024,
Poseidon BN254 x4, KZG10, Ethereum... (default transcript merlin; we use
the instance default EthereumTranscript — same work profile).

Usage: python scripts/bench_withdraw.py [height] [notes] [iters]
Set ZKT_PLONK_TIMING=1 for the per-round section breakdown.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from zkt_plonk_tpu.commitment import kzg
from zkt_plonk_tpu.circuits.withdraw import WithdrawCircuit
from zkt_plonk_tpu.cs import ConstraintSystem, LookupTable
from zkt_plonk_tpu.curves import make_context
from zkt_plonk_tpu.fields import BN254_FR
from zkt_plonk_tpu.gadgets.merkle_tree import MerkleTree, MerkleTreeStore
from zkt_plonk_tpu.hashing import Poseidon, bn254_constants
from zkt_plonk_tpu.hashing.merkle import PoECircuit
from zkt_plonk_tpu.plonk import ZKTPlonk

P = BN254_FR.modulus


def build(height, notes):
    const = bn254_constants(4)
    hasher = Poseidon(const, native=True)
    rng = random.Random(7)

    identifiers = [rng.randrange(1, 1 << 160) for _ in range(notes)]
    table = LookupTable(identifiers, size=1024)
    tree = MerkleTree(hasher, MerkleTreeStore(height=height))
    secrets = [rng.randrange(1, P) for _ in range(notes)]
    amounts = [1000 + 17 * i for i in range(notes)]

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

    circuit = WithdrawCircuit(
        constants=const,
        height=height,
        secrets=secrets,
        identifiers=identifiers,
        amount_inputs=amounts,
        poe_circuits=[
            PoECircuit(
                height=height, leaf_index=i, path_elements=tree.merkle_path(i)
            )
            for i in leaf_indices
        ],
        root=tree.root,
        new_secret=new_secret,
        new_identifier=new_identifier,
        withdraw_amount=withdraw_amount,
    )
    pub_inputs = [tree.root] + nullifiers + [withdraw_amount, new_identifier, new_leaf]
    return circuit, table, pub_inputs


def main():
    height = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    notes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    print(f"backend={jax.default_backend()} height={height} notes={notes}", flush=True)

    circuit, table, pub_inputs = build(height, notes)

    # circuit size
    cs = ConstraintSystem(P, setup=True, lookup_table=table)
    circuit.synthesize(cs)
    n_gates = cs.n
    bound = cs.circuit_bound()
    print(f"gates={n_gates} circuit_bound={bound} (2^{bound.bit_length()-1})", flush=True)

    inst = ZKTPlonk(curve="bn254", table=table)
    t0 = time.perf_counter()
    ck, cvk = kzg.setup(inst.ctx, max_degree=4 * bound, tau=987654321)
    print(f"srs setup({4*bound}): {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    compiled = inst.compile(circuit, ck, cvk)
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

    rng = random.Random(42)
    t0 = time.perf_counter()
    proof = inst.prove(compiled, circuit, rng=rng)
    print(f"prove (cold, incl jit): {time.perf_counter()-t0:.1f}s", flush=True)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        proof = inst.prove(compiled, circuit, rng=rng)
        times.append(time.perf_counter() - t0)
    print(f"prove (warm): {min(times):.2f}s  ({1/min(times):.3f} proofs/s)", flush=True)

    t0 = time.perf_counter()
    inst.verify(compiled, proof, pub_inputs)
    print(f"verify: {time.perf_counter()-t0:.2f}s -> OK", flush=True)


if __name__ == "__main__":
    main()
