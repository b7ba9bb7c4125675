"""SMT: host tree vs batched device processor/verifier."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P
from circuits_tpu.builder.smt import SMT, hash0, hash1
from circuits_tpu.ops import smt as dev

rng = random.Random(555)
NL = 9  # levels for tests (siblings arrays of this length)

jprocessor = jax.jit(dev.processor)
jverifier = jax.jit(dev.verifier)


def pad(s):
    return s + [0] * (NL - len(s))


FIXED_B = 48


def run_processor(ops):
    """ops: list of proof dicts + fnc tuples; runs one batched call.
    Pads to a fixed batch so every test shares one compiled executable."""
    n_real = len(ops)
    nop = dict(old_root=0, siblings=[], old_key=0, old_value=0,
               is_old0=False, new_key=0, new_value=0, fnc=(0, 0))
    ops = ops + [nop] * (FIXED_B - n_real)
    args = dict(
        old_root=fr.pack([o["old_root"] for o in ops]),
        siblings=fr.pack([pad(o["siblings"]) for o in ops]).transpose(2, 0, 1),
        old_key=fr.pack([o["old_key"] for o in ops]),
        old_value=fr.pack([o["old_value"] for o in ops]),
        is_old0=jnp.asarray(np.array([1 if o["is_old0"] else 0 for o in ops], np.uint32)),
        new_key=fr.pack([o["new_key"] for o in ops]),
        new_value=fr.pack([o["new_value"] for o in ops]),
        fnc0=jnp.asarray(np.array([o["fnc"][0] for o in ops], np.uint32)),
        fnc1=jnp.asarray(np.array([o["fnc"][1] for o in ops], np.uint32)),
    )
    new_root, ok = jprocessor(**args)
    return ([int(v) for v in fr.unpack_np(new_root)][:n_real],
            list(np.asarray(ok))[:n_real])


def test_host_tree_shapes():
    t = SMT()
    assert t.root == 0
    r1 = t.insert(3, 33)
    assert r1["is_old0"] and r1["siblings"] == []
    assert t.root == hash1(3, 33)
    # 3 = 0b011, 2 = 0b010 differ at bit 0
    t2 = SMT()
    t2.insert(3, 33)
    r2 = t2.insert(2, 22)
    assert not r2["is_old0"] and r2["old_key"] == 3
    assert t2.root == hash0(hash1(2, 22), hash1(3, 33))
    # keys 1 = 0b001 and 5 = 0b101 differ first at bit 2: push-down chain
    t3 = SMT()
    t3.insert(1, 11)
    t3.insert(5, 55)
    # path bits of 5 (LSB first): 1,0,1 -> right, left, right
    lf1, lf5 = hash1(1, 11), hash1(5, 55)
    assert t3.root == hash0(0, hash0(hash0(lf1, lf5), 0))
    assert t3.get(5) == 55 and t3.get(1) == 11 and t3.get(7) is None


def test_processor_insert_update_nop():
    t = SMT()
    ops = []
    keys = [rng.randrange(1, 2 ** (NL - 1)) for _ in range(12)]
    keys = list(dict.fromkeys(keys))
    for k in keys:
        pr = t.insert(k, k * 1000 + 7)
        pr["fnc"] = (1, 0)
        ops.append(pr)
    for k in keys[::3]:
        pr = t.update(k, k * 2000 + 9)
        pr["fnc"] = (0, 1)
        ops.append(pr)
    # NOP lane with garbage proof data must return old_root
    ops.append(dict(old_root=t.root, siblings=[123] + [0] * (NL - 1),
                    old_key=99, old_value=98, is_old0=False,
                    new_key=97, new_value=96, fnc=(0, 0)))
    roots, oks = run_processor(ops)
    assert all(oks)
    want = [o["new_root"] if o["fnc"] != (0, 0) else o["old_root"]
            for o in ops]
    assert roots == want


def test_processor_delete():
    t = SMT()
    keys = [3, 2, 1, 5, 9, 12, 30]
    for k in keys:
        t.insert(k, k + 100)
    ops = []
    for k in (5, 2, 30):
        pr = t.delete(k)
        pr["fnc"] = (1, 1)
        pr["new_key"] = pr.pop("del_key")
        pr["new_value"] = pr.pop("del_value")
        ops.append(pr)
    roots, oks = run_processor(ops)
    assert all(oks)
    assert roots == [o["new_root"] for o in ops]
    assert t.get(5) is None and t.get(3) == 103


def test_processor_bad_proof_fails():
    t = SMT()
    for k in (1, 2, 3, 9):
        t.insert(k, k)
    pr = t.update(3, 777)
    pr["fnc"] = (0, 1)
    bad = dict(pr)
    bad["old_root"] = (pr["old_root"] + 1) % P
    roots, oks = run_processor([pr, bad])
    assert oks == [True, False]


def test_verifier_inclusion_exclusion():
    t = SMT()
    for k in (1, 2, 3, 9, 17):
        t.insert(k, k * 7)
    B = 4
    # inclusion proofs for 3, 9 ; exclusion proofs for 5 (collides with...) and 64
    incl = [t.find(3), t.find(9)]
    excl = [t.find(5), t.find(64)]
    fnd = incl + excl
    keys = [3, 9, 5, 64]
    vals = [21, 63, 0, 0]
    ok = jverifier(
        jnp.ones(B, jnp.uint32),
        fr.pack([t.root] * B),
        fr.pack([pad(f.siblings) for f in fnd]).transpose(2, 0, 1),
        fr.pack([f.not_found_key for f in fnd]),
        fr.pack([f.not_found_value for f in fnd]),
        jnp.asarray(np.array([1 if f.is_old0 else 0 for f in fnd], np.uint32)),
        fr.pack(keys),
        fr.pack(vals),
        jnp.asarray(np.array([0, 0, 1, 1], np.uint32)),
    )
    assert all(np.asarray(ok))
    # wrong value -> inclusion fails
    ok2 = jverifier(
        jnp.ones(B, jnp.uint32),
        fr.pack([t.root] * B),
        fr.pack([pad(f.siblings) for f in fnd]).transpose(2, 0, 1),
        fr.pack([f.not_found_key for f in fnd]),
        fr.pack([f.not_found_value for f in fnd]),
        jnp.asarray(np.array([1 if f.is_old0 else 0 for f in fnd], np.uint32)),
        fr.pack(keys),
        fr.pack([22, 63, 0, 0]),
        jnp.asarray(np.array([0, 0, 1, 1], np.uint32)),
    )
    assert list(np.asarray(ok2)) == [False, True, True, True]


def test_random_mixed_sequence_vs_host():
    t = SMT()
    present = {}
    ops = []
    for step in range(40):
        action = rng.choice(["ins", "ins", "upd", "del"])
        if action == "ins" or not present:
            k = rng.randrange(1, 2 ** (NL - 1))
            if k in present:
                continue
            pr = t.insert(k, rng.randrange(P))
            present[k] = True
            pr["fnc"] = (1, 0)
        elif action == "upd":
            k = rng.choice(list(present))
            pr = t.update(k, rng.randrange(P))
            pr["fnc"] = (0, 1)
        else:
            k = rng.choice(list(present))
            pr = t.delete(k)
            del present[k]
            pr["fnc"] = (1, 1)
            pr["new_key"] = pr.pop("del_key")
            pr["new_value"] = pr.pop("del_value")
        ops.append(pr)
    roots, oks = run_processor(ops)
    assert all(oks)
    assert roots == [o["new_root"] for o in ops]
