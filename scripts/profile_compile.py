"""Cold-compile profiling: where does XLA CPU compile time go?

Usage: JAX_PLATFORMS=cpu python scripts/profile_compile.py [component ...]
Components: field poseidon smt eddsa decode rollup_tx fee_tx hash_inputs main
Uses a throwaway compile-cache dir so every number is a cold compile.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fresh cache dir -> cold compiles
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

from circuits_tpu.field import fr  # noqa: E402

T = int(os.environ.get("PROF_T", "8"))
L = int(os.environ.get("PROF_L", "16"))
MFT = int(os.environ.get("PROF_MFT", "2"))


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    try:
        nops = compiled.cost_analysis()
    except Exception:
        nops = {}
    flops = nops.get("flops", -1) if isinstance(nops, dict) else -1
    hlo = lowered.as_text()
    print(f"{name:16s} trace+lower={t1-t0:7.2f}s compile={t2-t1:7.2f}s "
          f"hlo_lines={len(hlo.splitlines()):7d} flops={flops}")
    return compiled


a = fr.pack(list(range(1, T + 1)))
b = fr.pack(list(range(100, 100 + T)))

which = set(sys.argv[1:]) or {"field", "poseidon", "smt", "eddsa", "decode",
                              "rollup_tx_small"}

if "field" in which:
    timeit("mont_mul", fr.mont_mul, a, b)
    timeit("inv", fr.inv, a)
    timeit("sqrt", lambda x: fr.sqrt(x)[0], a)

if "poseidon" in which:
    from circuits_tpu.ops.poseidon import poseidon
    timeit("poseidon4", lambda *xs: poseidon(list(xs)), a, b, a, b)

if "smt" in which:
    from circuits_tpu.ops import smt
    sib = jnp.zeros((L + 1, 16, T), dtype=jnp.uint32)
    fl = jnp.zeros((T,), dtype=jnp.uint32)
    timeit("smt_processor",
           lambda old, s, ok_, ov, i0, nk, nv, f0, f1:
           smt.processor(old, s, ok_, ov, i0, nk, nv, f0, f1),
           a, sib, a, b, fl, a, b, fl, fl)

if "eddsa" in which:
    from circuits_tpu.ops.babyjubjub import eddsa_poseidon_verify
    en = jnp.ones((T,), dtype=jnp.uint32)
    timeit("eddsa_verify", eddsa_poseidon_verify, en, a, b, a, a, b, a)

if which & {"main", "decode", "rollup_tx", "pieces", "lanes"}:
    from __graft_entry__ import _build_packed
    packed = _build_packed(T, L, 2, MFT)

if "main" in which:
    from functools import partial
    from circuits_tpu.models.rollup_main import rollup_main
    fn = partial(rollup_main, n_tx=T, n_levels=L, max_l1_tx=2,
                 max_fee_tx=MFT)
    timeit("rollup_main", fn, packed)

if "lanes" in which:
    from functools import partial
    from circuits_tpu.models.rollup_main import (rollup_main_lanes,
                                                 build_chains)
    chains = build_chains(packed, T, MFT)
    fn = partial(rollup_main_lanes, n_tx=T, n_levels=L, max_fee_tx=MFT)
    timeit("lanes", fn, packed, chains)

if "pieces" in which:
    from functools import partial
    from circuits_tpu.models import rollup_main as rm
    from circuits_tpu.models.decode_tx import decode_tx
    from circuits_tpu.models.rollup_tx import rollup_tx
    from circuits_tpu.models.fee_tx import fee_tx
    from circuits_tpu.models.hash_inputs import hash_inputs
    from circuits_tpu.field import fr as _fr

    packed = _build_packed(T, L, 2, MFT) if "packed" not in dir() else packed
    chains = rm.build_chains(packed, T, MFT)

    def dec_fn(inp, ch):
        return decode_tx(
            L, ch["prev_on_chain"], inp["tx_compressed_data"],
            inp["max_num_batch"], inp["amount_f"], inp["to_eth_addr"],
            inp["to_bjj_ay"], inp["rq_tx_compressed_data_v2"],
            inp["rq_to_eth_addr"], inp["rq_to_bjj_ay"], inp["from_eth_addr"],
            inp["from_bjj_compressed"], inp["load_amount_f"],
            jnp.broadcast_to(inp["global_chain_id"], (16, T)),
            jnp.broadcast_to(inp["current_num_batch"], (16, T)),
            inp["on_chain"], inp["new_account"],
            inp["aux_from_idx"], inp["aux_to_idx"], ch["in_idx"])

    timeit("decode_tx", dec_fn, packed, chains)

    def txin(inp, ch):
        dec, _ = dec_fn(inp, ch)
        zero1 = _fr.zeros((1,))
        fut_v2, past_v2 = rm._neighbors(inp["tx_compressed_data_v2"], zero1)
        fut_eth, past_eth = rm._neighbors(inp["to_eth_addr"], zero1)
        fut_ay, past_ay = rm._neighbors(inp["to_bjj_ay"], zero1)
        fee_plan = jnp.broadcast_to(
            jnp.moveaxis(inp["fee_plan_tokens"], 1, 0)[:, :, None],
            (MFT, 16, T))
        return dict(
            fee_plan_tokens=fee_plan, acc_fee_in=ch["acc_fee_in"],
            future_tx_v2=fut_v2, past_tx_v2=past_v2,
            future_to_eth=fut_eth, past_to_eth=past_eth,
            future_to_ay=fut_ay, past_to_ay=past_ay,
            from_idx=dec["from_idx"], aux_from_idx=inp["aux_from_idx"],
            to_idx=dec["to_idx"], aux_to_idx=inp["aux_to_idx"],
            to_bjj_ay=inp["to_bjj_ay"], to_bjj_sign=dec["to_bjj_sign"],
            to_eth_addr=inp["to_eth_addr"],
            amount=dec["amount"], token_id=dec["token_id"],
            nonce=dec["nonce"], user_fee_sel=_fr.low_u32(dec["user_fee"]),
            rq_offset=inp["rq_offset"].astype(jnp.uint32),
            on_chain=inp["on_chain"], new_account=inp["new_account"],
            rq_tx_v2=inp["rq_tx_compressed_data_v2"],
            rq_to_eth=inp["rq_to_eth_addr"], rq_to_ay=inp["rq_to_bjj_ay"],
            sig_l2_hash=dec["sig_l2_hash"],
            s=inp["s"], r8x=inp["r8x"], r8y=inp["r8y"],
            from_eth_addr=inp["from_eth_addr"],
            from_bjj_compressed=inp["from_bjj_compressed"],
            load_amount_f=inp["load_amount_f"],
            token_id1=inp["token_id1"], nonce1=inp["nonce1"],
            sign1=inp["sign1"], balance1=inp["balance1"], ay1=inp["ay1"],
            eth_addr1=inp["eth_addr1"], siblings1=inp["siblings1"],
            is_old0_1=inp["is_old0_1"], old_key1=inp["old_key1"],
            old_value1=inp["old_value1"],
            token_id2=inp["token_id2"], nonce2=inp["nonce2"],
            sign2=inp["sign2"], balance2=inp["balance2"],
            new_exit=inp["new_exit"], ay2=inp["ay2"],
            eth_addr2=inp["eth_addr2"], siblings2=inp["siblings2"],
            is_old0_2=inp["is_old0_2"], old_key2=inp["old_key2"],
            old_value2=inp["old_value2"],
            old_state_root=ch["old_state_root"],
            old_exit_root=ch["old_exit_root"],
        )

    def rt_fn(inp, ch):
        return rollup_tx(txin(inp, ch), L)

    timeit("decode+rollup_tx", rt_fn, packed, chains)

    def fee_fn(inp):
        fee_old_root = jnp.concatenate(
            [inp["im_init_state_root_fee"], inp["im_state_root_fee"]],
            axis=-1)
        return fee_tx(
            fee_old_root, inp["fee_plan_tokens"], inp["fee_idxs"],
            inp["im_final_acc_fee"], inp["token_id3"], inp["nonce3"],
            inp["sign3"], inp["balance3"], inp["ay3"], inp["eth_addr3"],
            inp["siblings3"])

    timeit("fee_tx", fee_fn, packed)

    def hi_fn(inp):
        l1_flat = jnp.zeros((736 * 2, 1), dtype=jnp.uint32)
        l1l2_flat = jnp.zeros(((2 * L + 48) * T, 1), dtype=jnp.uint32)
        return hash_inputs(
            L, T, 2, MFT, inp["old_last_idx"], inp["old_last_idx"],
            inp["old_state_root"], inp["old_state_root"],
            inp["old_state_root"], l1_flat, l1l2_flat,
            jnp.moveaxis(inp["fee_idxs"], 1, 0)[:, :, None],
            inp["global_chain_id"], inp["current_num_batch"])

    timeit("hash_inputs", hi_fn, packed)
