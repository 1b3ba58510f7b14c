"""Constraint-system gate tests via the dual-mode harness.

Mirrors the reference's inline gate tests (``arithmetic.rs:212-290``,
``constraint_system/mod.rs:464-477``, ``permutation/mod.rs:276-326``,
``multiset.rs:272-329``).
"""

import random

import pytest

from zkt_plonk_tpu.fields import BN254_FR
from zkt_plonk_tpu.cs import (
    ConstraintSystem,
    LookupTable,
    LTVariable,
    lt,
    combine_split,
    test_gate_constraints as run_gate_constraints,
)

P = BN254_FR.modulus


def lt_rand(var, rng):
    return LTVariable(var, rng.randrange(P), rng.randrange(P))


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div"])
def test_arith_gates(op):
    rng = random.Random(30)
    xv, yv = rng.randrange(P), rng.randrange(P)
    expect = {
        "add": (xv + yv) % P,
        "sub": (xv - yv) % P,
        "mul": xv * yv % P,
        "div": xv * pow(yv, -1, P) % P,
    }[op]
    ca, co = rng.randrange(P), rng.randrange(P)
    cb, cd = rng.randrange(P), rng.randrange(P)

    def process(cs):
        # note: the harness runs this twice; use deterministic values
        x = cs.assign_variable(xv)
        y = cs.assign_variable(yv)
        ltx = lt(x).linear_transform(ca, co, P)
        lty = lt(y).linear_transform(cb, cd, P)
        # expected values computed through the same transform semantics
        z = getattr(cs, f"{op}_gate")(ltx, lty)
        return [(lt(z), _apply_op(op, _tval(xv, ltx), _tval(yv, lty)))]

    run_gate_constraints(P, process, [], LookupTable())


def _tval(v, ltv):
    return (v * ltv.coeff + ltv.offset) % P


def _apply_op(op, a, b):
    if op == "add":
        return (a + b) % P
    if op == "sub":
        return (a - b) % P
    if op == "mul":
        return a * b % P
    return a * pow(b, -1, P) % P


def test_boolean_and_selects():
    def process(cs):
        one = cs.assign_variable(1)
        zero = cs.assign_variable(0)
        b1 = cs.boolean_gate(one)
        b0 = cs.boolean_gate(zero)
        a = cs.assign_variable(10)
        b = cs.assign_variable(20)
        sel_a = cs.conditional_select(b1, lt(a), lt(b))
        sel_b = cs.conditional_select(b0, lt(a), lt(b))
        z1 = cs.conditional_select_zero(b0, lt(a))
        o1 = cs.conditional_select_one(b0, lt(a))
        andv = cs.and_gate(b1, b0)
        orv = cs.or_gate(b1, b0)
        xorv = cs.xor_gate(b1, b1)
        return [
            (lt(sel_a), 10),
            (lt(sel_b), 20),
            (lt(z1), 0),
            (lt(o1), 1),
            (lt(andv.var), 0),
            (lt(orv.var), 1),
            (lt(xorv.var), 0),
        ]

    run_gate_constraints(P, process, [], LookupTable())


def test_public_input_and_zero_check():
    pi_val = 123456789

    def process(cs):
        x = cs.assign_variable(pi_val)
        cs.set_variable_public(lt(x))
        z = cs.assign_variable(0)
        flag = cs.should_be_zero_with_output(lt(z))
        flag2 = cs.should_eq_with_output(lt(x), lt(x))
        return [(lt(flag.var), 1), (lt(flag2.var), 1)]

    run_gate_constraints(P, process, [pi_val], LookupTable())


def test_bits_le_constrain():
    def process(cs):
        bits = [cs.boolean_gate(cs.assign_variable(b)) for b in (1, 0, 1, 1)]
        v = cs.bits_le_constrain(bits)
        return [(lt(v), 0b1101)]

    run_gate_constraints(P, process, [], LookupTable())


def test_lookup_gate():
    table = LookupTable([1, 2, 5], size=16)

    def process(cs):
        c = cs.assign_variable(5)
        cs.lookup_constrain(lt(c))
        return []

    run_gate_constraints(P, process, [], table)


def test_lookup_gate_fails_for_missing():
    table = LookupTable([1, 2, 5], size=16)

    def process(cs):
        c = cs.assign_variable(7)
        cs.lookup_constrain(lt(c))
        return []

    with pytest.raises(AssertionError):
        run_gate_constraints(P, process, [], table)


def test_combine_split_paper_example():
    # the worked Plonkup-paper example (``multiset.rs:272-329``)
    t = [0, 1, 2, 3, 4, 5, 6]
    f = [3, 6, 0, 5, 4, 3, 2, 0, 0, 1, 2]
    h1, h2 = combine_split(t, f)
    assert h1 == [0, 0, 1, 2, 2, 3, 4, 5, 6]
    assert h2 == [0, 0, 1, 2, 3, 3, 4, 5, 6]


def test_sigma_permutation_cycles():
    # hand-derived wire map (``permutation/mod.rs:276-326``)
    from zkt_plonk_tpu.cs.composer import Permutation

    perm = Permutation()
    x1, x2, x3, x4 = (perm.new_variable() for _ in range(4))
    perm.add_variables_to_map(x1, x4, x2, 0)
    perm.add_variables_to_map(x1, x3, x2, 1)
    perm.add_variables_to_map(x1, x2, x3, 2)
    perm.add_variables_to_map(x3, x4, x2, 3)
    s1, s2, s3 = perm.compute_sigma_permutations(4)
    L, R, O = 0, 1, 2
    assert s1 == [(L, 1), (L, 2), (L, 0), (R, 1)]
    assert s2 == [(R, 3), (O, 2), (O, 3), (R, 0)]
    assert s3 == [(O, 1), (R, 2), (L, 3), (O, 0)]
