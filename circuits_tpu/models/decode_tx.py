"""DecodeTx — batched transaction-field unpacking + DA bitstrings.

Replicates /root/reference/src/decode-tx.circom:44-369: unpack
txCompressedData (225 bits), decode amountF (float40), rebuild
txCompressedDataV2 (zeroed on L1), emit the data-availability bitstrings
L1L2TxData / L1TxFullData, compute sigL2Hash (Poseidon(6)), and enforce
the ordering / chainID / constSig / idx-increment / maxNumBatch checks.

Bitstrings are (nbits, B) uint32 0/1 arrays in the circuit's output order
(big-endian per field, matching hash-inputs packing).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import fr
from ..ops.gadgets import decode_float_bin, fits_bits

CONST_SIG = 3322668559  # src/decode-tx.circom:353

L1_TX_FULL_BITS = 160 + 256 + 48 + 40 + 40 + 32 + 48  # :73


def l1l2_bits(n_levels: int) -> int:
    return 2 * n_levels + 40 + 8  # :57


def decode_tx(
    n_levels: int,
    previous_on_chain, tx_compressed_data, max_num_batch, amount_f,
    to_eth_addr, to_bjj_ay, rq_tx_v2, rq_to_eth, rq_to_ay,
    from_eth_addr, from_bjj_compressed, load_amount_f,
    global_chain_id, current_num_batch, on_chain, new_account,
    aux_from_idx, aux_to_idx, in_idx,
):
    """All field args (16, B); from_bjj_compressed (256, B) 0/1;
    previous_on_chain / on_chain / new_account (B,) bool-ish.

    Returns (outputs: dict, ok: (B,) bool)."""
    from ..ops.poseidon import poseidon

    bshape = tx_compressed_data.shape[1:]
    on_chain = on_chain.astype(jnp.bool_)
    new_account = new_account.astype(jnp.bool_)
    previous_on_chain = previous_on_chain.astype(jnp.bool_)
    not_l1 = (~on_chain).astype(jnp.uint32)

    ok = fits_bits(tx_compressed_data, 225)
    data_bits = fr.bits_le(tx_compressed_data, 225)  # (225, B)

    const_sig = fr.from_bits_le(data_bits[0:32])
    chain_id = fr.from_bits_le(data_bits[32:48])
    from_idx = fr.from_bits_le(data_bits[48:96])
    to_idx = fr.from_bits_le(data_bits[96:144])
    token_id = fr.from_bits_le(data_bits[144:176])
    nonce = fr.from_bits_le(data_bits[176:216])
    user_fee = fr.from_bits_le(data_bits[216:224])
    to_bjj_sign = data_bits[224].astype(jnp.bool_)

    # idx padding: bits nLevels..47 must be zero (:120-137)
    pad_from = jnp.any(data_bits[48 + n_levels:96].astype(bool), axis=0)
    pad_to = jnp.any(data_bits[96 + n_levels:144].astype(bool), axis=0)
    ok = ok & ~pad_from & ~pad_to

    # amount (float40, :164-172)
    ok = ok & fits_bits(amount_f, 40)
    amount_bits = fr.bits_le(amount_f, 40)
    amount = decode_float_bin(amount_bits)

    # txCompressedDataV2 (:174-212) — L2 fields masked to 0 on L1
    v2_bits = jnp.concatenate([
        data_bits[48:96] * not_l1,      # fromIdx
        data_bits[96:144] * not_l1,     # toIdx
        amount_bits * not_l1,           # amountF
        data_bits[144:176] * not_l1,    # tokenID
        data_bits[176:216] * not_l1,    # nonce
        data_bits[216:224] * not_l1,    # userFee
        data_bits[224:225],             # toBjjSign (not masked, :210)
    ], axis=0)
    tx_compressed_data_v2 = fr.from_bits_le(v2_bits)

    # final receiver idx for DA (:221-230)
    select_aux = (~on_chain) & fr.is_zero(to_idx)
    final_to_idx = fr.select(select_aux, aux_to_idx, to_idx)
    final_to_bits = fr.bits_le(final_to_idx, n_levels)

    # L1L2TxData (:232-247): fromIdx | finalToIdx | amountF | fee(masked L2)
    def rev(x):
        return jnp.flip(x, axis=0)

    l1l2 = jnp.concatenate([
        rev(data_bits[48:48 + n_levels]),
        rev(final_to_bits),
        rev(amount_bits),
        rev(data_bits[216:224] * not_l1),
    ], axis=0)

    # sigL2Hash (:249-283)
    ok = ok & fits_bits(to_eth_addr, 160) & fits_bits(max_num_batch, 32)
    element1_bits = jnp.concatenate([
        fr.bits_le(to_eth_addr, 160),
        amount_bits,
        fr.bits_le(max_num_batch, 32),
    ], axis=0)
    element1 = fr.from_bits_le(element1_bits)
    sig_l2_hash = poseidon([
        tx_compressed_data, element1, to_bjj_ay, rq_tx_v2, rq_to_eth,
        rq_to_ay])

    # L1TxFullData (:285-324), all masked by onChain
    l1mask = on_chain.astype(jnp.uint32)
    ok = ok & fits_bits(from_eth_addr, 160) & fits_bits(load_amount_f, 40)
    load_bits = fr.bits_le(load_amount_f, 40)
    l1full = jnp.concatenate([
        rev(fr.bits_le(from_eth_addr, 160)),
        rev(from_bjj_compressed.astype(jnp.uint32)),
        rev(data_bits[48:96]),      # fromIdx (48)
        rev(load_bits),
        rev(amount_bits),
        rev(data_bits[144:176]),    # tokenID
        rev(data_bits[96:144]),     # toIdx
    ], axis=0) * l1mask

    # checks (:326-368)
    from_idx_zero = fr.is_zero(from_idx)
    ok = ok & ((on_chain & from_idx_zero) == new_account)  # :331

    out_idx = fr.select(on_chain & new_account,
                        fr.add(in_idx, fr.const(1, bshape)), in_idx)  # :334
    idx_ok = fr.eq(aux_from_idx, out_idx) | ~(on_chain & new_account)  # :338
    ok = ok & idx_ok

    ok = ok & ~((~previous_on_chain) & on_chain)  # :344 L1-before-L2

    chain_ok = fr.eq(global_chain_id, chain_id) | on_chain  # :347
    const_ok = fr.eq(const_sig, jnp.broadcast_to(
        fr.const(CONST_SIG, bshape), const_sig.shape)) | on_chain  # :355
    ok = ok & chain_ok & const_ok

    # maxNumBatch >= currentNumBatch if maxNumBatch != 0 (:360-368)
    mnb_zero = fr.is_zero(max_num_batch)
    mnb_ok = ~fr.gt(current_num_batch, max_num_batch)
    ok = ok & (mnb_ok | mnb_zero)

    outputs = dict(
        l1l2_tx_data=l1l2,
        tx_compressed_data_v2=tx_compressed_data_v2,
        l1_tx_full_data=l1full,
        out_idx=out_idx,
        from_idx=from_idx,
        to_idx=to_idx,
        token_id=token_id,
        nonce=nonce,
        user_fee=user_fee,
        to_bjj_sign=to_bjj_sign,
        amount=amount,
        sig_l2_hash=sig_l2_hash,
    )
    return outputs, ok
