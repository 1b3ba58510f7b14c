"""Extract baked Poseidon BN254 constants from the reference sources into JSON.

The reference stores audited hex blobs (gadgets/src/poseidon/bn254_x{3,4,5}.rs)
parsed with an idiosyncratic scheme (skip first two hex chars, little-endian
bytes — gadgets/src/poseidon/mod.rs:13-21). We replicate that parsing here once
and store canonical decimal ints, so the runtime needs no reference access.
"""
import json, re, sys

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617

def parse_hex(s):
    v = int.from_bytes(bytes.fromhex(s[2:]), "little")
    assert v < P, s
    return v

out = {}
for width in (3, 4, 5):
    src = open(f"/root/reference/gadgets/src/poseidon/bn254_x{width}.rs").read()
    full = int(re.search(r"FULL_ROUNDS: usize = (\d+)", src).group(1))
    partial = int(re.search(r"PARTIAL_ROUNDS: usize = (\d+)", src).group(1))
    w = int(re.search(r"WIDTH: usize = (\d+)", src).group(1))
    assert w == width
    rc_block = re.search(r"ROUND_CONSTANTS[^=]*= &\[(.*?)\];", src, re.S).group(1)
    rcs = [parse_hex(m) for m in re.findall(r'"([0-9A-Fa-f]+)"', rc_block)]
    assert len(rcs) >= (full + partial) * width, (len(rcs), (full+partial)*width)
    mds_block = re.search(r"MDS_MATRIX[^=]*= &\[(.*)\];", src, re.S).group(1)
    rows = re.findall(r"&\[(.*?)\]", mds_block, re.S)
    mds = [[parse_hex(m) for m in re.findall(r'"([0-9A-Fa-f]+)"', row)] for row in rows]
    assert len(mds) == width and all(len(r) == width for r in mds), [len(r) for r in mds]
    out[str(width)] = {
        "full_rounds": full,
        "partial_rounds": partial,
        "round_constants": [str(v) for v in rcs],
        "mds": [[str(v) for v in row] for row in mds],
    }

json.dump(out, open("zkt_plonk_tpu/hashing/poseidon/bn254_constants.json", "w"))
print("ok", {k: (v["full_rounds"], v["partial_rounds"], len(v["round_constants"])) for k, v in out.items()})
