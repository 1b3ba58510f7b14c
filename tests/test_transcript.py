"""Known-answer tests for Keccak-256 and the EthereumTranscript.

The transcript vectors are the golden hex values from the reference's
in-tree test (``gadgets/src/transcript.rs:100-127``) — the byte-exactness
anchor for Fiat-Shamir compatibility.
"""

from zkt_plonk_tpu.transcript import EthereumTranscript, keccak256


def test_keccak256_known_answers():
    # standard Keccak-256 (EVM) vectors
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    assert (
        keccak256(b"a" * 200).hex()  # multi-block
        == keccak256(b"a" * 100 + b"a" * 100).hex()
    )


def test_ethereum_transcript_golden_vectors():
    t = EthereumTranscript("test")
    t.append_u64("a", 1)
    a = t.challenge_scalar("a")
    assert a.to_bytes(32, "big").hex() == (
        "0f9d11cec4f06b0d18060cde3db4196495ddfbb096108951446fc8a1d45f4b59"
    )

    t.append_scalar("b", 2)
    b = t.challenge_scalar("b")
    assert b.to_bytes(32, "big").hex() == (
        "0f4dccb919a5dba2dd010a562ba45b4551291f5e565706536e78b24ac8b5c64d"
    )

    t.append_commitment("c", (3, 4))
    c = t.challenge_scalar("c")
    assert c.to_bytes(32, "big").hex() == (
        "1b5bf46adfcd1dd4f9ac7166586cf83f261192bc4b83fdda30ddee22f9054c1f"
    )
