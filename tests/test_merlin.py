"""Merlin/STROBE conformance tests (published merlin crate vectors)."""

from zkt_plonk_tpu.transcript.merlin import MerlinTranscript


def test_merlin_conformance_vector():
    t = MerlinTranscript("test protocol")
    t._append_message(b"some label", b"some data")
    got = t._challenge_bytes(b"challenge", 32)
    assert got.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_determinism_and_label_sensitivity():
    def run(label, msg_label):
        t = MerlinTranscript(label)
        t.append_u64(msg_label, 42)
        return t.challenge_scalar("c")

    assert run("p", "a") == run("p", "a")
    assert run("p", "a") != run("p", "b")
    assert run("p", "a") != run("q", "a")


def test_merlin_scalar_commitment_flow():
    t = MerlinTranscript("ZKT Plonk")
    t.append_u64("circuit_size", 128)
    t.append_scalar("x", 12345)
    t.append_commitment("c", (3, 4))
    t.append_commitment("c2", None)
    a = t.challenge_scalar("beta")
    b = t.challenge_scalar("gamma")
    assert a != b
    assert 0 < a < 1 << 248  # 31 bytes
