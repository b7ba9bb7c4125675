"""Withdraw — standalone exit-proof circuit.

Replicates /root/reference/src/withdraw.circom:21-72: HashState of the
claimed leaf, SMTVerifier inclusion proof against rootExit, SHA256 of the
public fields. Batched over withdrawal lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import fr
from ..ops.smt import verifier as smt_verifier
from .rollup_tx import hash_state
from .hash_inputs import hash_inputs_withdrawal


def withdraw(n_levels: int, root_exit, eth_addr, token_id, balance, idx,
             sign, ay, siblings_state, debug: bool = False):
    """Returns (hash_global_inputs (16, B), ok (B,)); with debug=True a
    third intermediates dict (witness-vector export)."""
    bshape = idx.shape[1:]
    state = hash_state(token_id, fr.zeros(bshape), sign, balance, ay,
                       eth_addr)
    enabled = jnp.ones(bshape, dtype=jnp.bool_)
    zero_flag = jnp.zeros(bshape, dtype=jnp.bool_)
    ok = smt_verifier(enabled, root_exit, siblings_state,
                      fr.zeros(bshape), fr.zeros(bshape), zero_flag,
                      idx, state, zero_flag)
    h, h_ok = hash_inputs_withdrawal(n_levels, root_exit, eth_addr,
                                     token_id, balance, idx)
    if debug:
        return h, ok & h_ok, dict(state_hash=state)
    return h, ok & h_ok
