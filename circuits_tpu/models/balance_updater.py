"""BalanceUpdater — batched sender/receiver balance transition.

Replicates /root/reference/src/balance-updater.circom:24-113: fee applies
only on L2 non-NOP, loadAmount only on L1, nullify flags zero the amounts,
and the 193-bit underflow check keeps L1 txs alive as 0-amount updates
while making L2 underflow a constraint failure.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import fr
from ..ops.gadgets import compute_fee, fits_bits


def balance_updater(
    old_balance_sender, old_balance_receiver, amount, load_amount,
    fee_selector, on_chain, nop, nullify_load_amount, nullify_amount,
):
    """fee_selector: (B,) uint32. Other field args (16, B); flags (B,).

    Returns (outputs: dict, ok: (B,) bool). ok covers the ComputeFee
    overflow constraints (:86-88 via compute-fee.circom) and the L2
    underflow hard failure (:83)."""
    bshape = amount.shape[1:]
    on_chain = on_chain.astype(jnp.bool_)
    nop = nop.astype(jnp.bool_)
    nullify_load_amount = nullify_load_amount.astype(jnp.bool_)
    nullify_amount = nullify_amount.astype(jnp.bool_)

    apply_fee = (~on_chain) & (~nop)  # :53
    fee2_charge, fee_ok = compute_fee(fee_selector, amount, apply_fee)

    zero = fr.zeros(bshape)
    eff_load1 = fr.select(on_chain, load_amount, zero)          # :59
    eff_load2 = fr.select(nullify_load_amount, zero, eff_load1)  # :60
    eff_amount1 = fr.select(nop, zero, amount)                   # :61
    eff_amount2 = fr.select(nullify_amount, zero, eff_amount1)   # :62

    # underflow check: bit 192 of 2^192 + bal + load - amt - fee (:77-80)
    bias = jnp.broadcast_to(fr.const(1 << 192, bshape), amount.shape)
    acc = fr.add(bias, old_balance_sender)
    acc = fr.add(acc, eff_load2)
    acc = fr.sub(acc, eff_amount2)
    acc = fr.sub(acc, fee2_charge)
    # circom Num2Bits(193) fails if the value needs more bits
    in_range = fits_bits(acc, 193)
    underflow_ok = fr.bits_le(acc, 193)[192].astype(jnp.bool_) & in_range

    # L2 underflow is a hard failure (:83)
    ok = fee_ok & in_range & (underflow_ok | on_chain)

    eff_amount3 = fr.select(underflow_ok, eff_amount2, zero)  # :86

    new_sender = fr.sub(fr.add(old_balance_sender, eff_load2),
                        fr.add(eff_amount3, fee2_charge))     # :90
    new_receiver = fr.add(old_balance_receiver, eff_amount3)  # :91

    amount1_zero = fr.is_zero(eff_amount1)
    is_amount_nullified = nullify_amount | ~underflow_ok  # :100
    is_p2_nop = ~amount1_zero  # :105 (NB: name from circuit; 1 = p2 active)

    outputs = dict(
        new_balance_sender=new_sender,
        new_balance_receiver=new_receiver,
        is_p2_nop=is_p2_nop,
        fee2_charge=fee2_charge,
        is_amount_nullified=is_amount_nullified,
    )
    return outputs, ok
