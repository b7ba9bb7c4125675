"""CLI mirroring the reference build tooling.

Verbs follow /root/reference/tools/build-circuit.js:32-48 and
tools/generate-input.js — with the compile pipeline replaced by jit
specialization (no circom/nasm/g++ stages):

  create  nTx nLevels maxL1Tx maxFeeTx   -> write circuit config dir
  compile nTx nLevels maxL1Tx maxFeeTx   -> eager-compile + warm the
                                            persistent XLA cache
  input   nAccounts nTransfers [nTx nLevels maxL1Tx maxFeeTx]
                                         -> generate inputs-N.json
  compilewitness [params]                -> alias of compile: the
                                            reference's circom->C++->g++
                                            pipeline (actions.js:98-130)
                                            is one jit specialization here
  witness input.json output.json [params]-> evaluate witness, write
                                            public outputs + verdict
  witnessfull input.json out.wtns [params]-> export the FULL canonical
                                            witness vector (every signal)
                                            as a snarkjs .wtns container
                                            + .sym.json name sidecar, and
                                            re-verify every residual from
                                            the exported vector alone
                                            (reference witness artifact:
                                            actions.js:132-146)
  check   input.json [params]            -> constraint verdict only
  trace   input.json [params] [signal]   -> printSignals equivalent:
                                            dump the named-signal catalog
                                            (or one signal) per tx lane
  audit                                  -> r1cs residual audit report
  zkey / solidity                        -> out of scope (documented):
                                            Groth16 proving/verifier
                                            export stays with snarkjs
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


def _stringify(obj):
    if isinstance(obj, bool):
        return obj
    if isinstance(obj, int):
        return str(obj)
    if isinstance(obj, list):
        return [_stringify(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _stringify(v) for k, v in obj.items()}
    return obj


def _parse(obj):
    if isinstance(obj, str) and (obj.isdigit() or
                                 (obj.startswith("-") and
                                  obj[1:].isdigit())):
        return int(obj)
    if isinstance(obj, list):
        return [_parse(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _parse(v) for k, v in obj.items()}
    return obj


def _circuit_dir(n_tx, n_levels, max_l1, max_fee) -> Path:
    return Path(f"rollup-{n_tx}-{n_levels}-{max_l1}-{max_fee}")


def cmd_create(args):
    n_tx, n_levels, max_l1, max_fee = map(int, args[:4])
    if n_levels < 16:
        print("WARNING: nLevels < 16 is incompatible with firstIdx = 255 "
              "(reference tools/build-circuit.js:26-29)")
    d = _circuit_dir(n_tx, n_levels, max_l1, max_fee)
    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps(dict(
        nTx=n_tx, nLevels=n_levels, maxL1Tx=max_l1, maxFeeTx=max_fee)))
    print(f"created {d}")


def cmd_compile(args):
    """Eager-compile + warm the persistent XLA cache + write the AOT
    trace artifact (rollup-N-L-ML-MF/aot.bin) so later processes skip
    Python tracing entirely — the compile-once binary analogue
    (reference actions.js:98-130)."""
    import jax
    from circuits_tpu.engine.witness import RollupEngine
    from circuits_tpu.r1cs.constraints import total_constraints

    n_tx, n_levels, max_l1, max_fee = map(int, args[:4])
    from circuits_tpu.utils.compile_opts import enable_persistent_cache
    enable_persistent_cache(jax)
    t0 = time.time()
    eng = RollupEngine(n_tx, n_levels, max_l1, max_fee)
    from __graft_entry__ import _build_packed  # noqa  (example inputs)
    packed = _build_packed(n_tx, n_levels, max_l1, max_fee)
    eng._fn(packed)[1].block_until_ready()
    print(f"compiled RollupMain({n_tx},{n_levels},{max_l1},{max_fee}) "
          f"in {time.time()-t0:.1f}s; "
          f"~{total_constraints(n_tx, n_levels, max_l1, max_fee):,} "
          "reference constraints")
    from circuits_tpu.engine import aot
    t0 = time.time()
    p = aot.export_rollup_main(n_tx, n_levels, max_l1, max_fee)
    print(f"AOT trace artifact: {p} "
          f"({p.stat().st_size // 1024} KB, {time.time()-t0:.1f}s)")


def cmd_input(args):
    """generate-input.js equivalent: N accounts via batched L1 deposits,
    then random transfers (tools/generate-input.js:61-109)."""
    import random as rnd
    from circuits_tpu.builder.rollup_db import RollupDB
    from circuits_tpu.builder.account import HermezAccount
    from circuits_tpu.builder import float40

    n_accounts = int(args[0]) if args else 32
    n_transfers = int(args[1]) if len(args) > 1 else 16
    n_tx = int(args[2]) if len(args) > 2 else 32
    n_levels = int(args[3]) if len(args) > 3 else 16
    max_l1 = int(args[4]) if len(args) > 4 else 8
    max_fee = int(args[5]) if len(args) > 5 else 64

    rnd.seed(0)
    db = RollupDB()
    accounts = [HermezAccount(i + 1) for i in range(n_accounts)]
    deposit = 10_000_000_000
    i = 0
    while i < n_accounts:
        bb = db.build_batch(n_tx, n_levels, max_l1, max_fee)
        for acc in accounts[i:i + max_l1]:
            bb.add_tx(dict(
                fromIdx=0, loadAmountF=float40.fix2float(deposit),
                tokenID=1, fromBjjCompressed=acc.bjjCompressed,
                fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))
        bb.build()
        db.consolidate(bb)
        i += max_l1
    for j, acc in enumerate(accounts):
        acc.idx = 256 + j

    bb = db.build_batch(n_tx, n_levels, max_l1, max_fee)
    bb.add_token(1)
    bb.add_fee_idx(accounts[0].idx)
    nonces = {}
    for _ in range(min(n_transfers, n_tx)):
        src, dst = rnd.sample(accounts, 2)
        tx = dict(fromIdx=src.idx, toIdx=dst.idx, tokenID=1,
                  amount=float40.round_fix(rnd.randint(1, 1000) * 1000),
                  userFee=126, nonce=nonces.get(src.idx, 0), onChain=0)
        nonces[src.idx] = nonces.get(src.idx, 0) + 1
        src.sign_tx(tx)
        bb.add_tx(tx)
    bb.build()
    out = Path(f"inputs-{n_tx}.json")
    out.write_text(json.dumps(_stringify(bb.get_input())))
    print(f"wrote {out} (expected hashGlobalInputs = "
          f"{bb.get_hash_inputs()})")


def _load_params(args, idx):
    if len(args) > idx:
        return tuple(map(int, args[idx:idx + 4]))
    raise SystemExit("pass nTx nLevels maxL1Tx maxFeeTx")


def cmd_witness(args):
    from circuits_tpu.engine.witness import RollupEngine

    inp = _parse(json.loads(Path(args[0]).read_text()))
    params = _load_params(args, 2)
    eng = RollupEngine(*params)
    t0 = time.time()
    out, ok = eng.run(inp)
    dt = time.time() - t0
    res = dict(ok=ok, outputs=_stringify(out),
               witnessTimeSeconds=round(dt, 3))
    Path(args[1]).write_text(json.dumps(res, indent=1))
    print(f"witness time: {dt:.3f}s  ok={ok}  "
          f"hashGlobalInputs={out['hash_global_inputs']}")


def cmd_witnessfull(args):
    """Export the full signal-indexed witness vector (the prover handoff
    artifact the reference writes at actions.js:132-146) and prove its
    validity by re-checking every residual from the exported file alone."""
    from circuits_tpu.engine.witness import RollupEngine
    from circuits_tpu.engine import witness_vector as wv
    from circuits_tpu.r1cs.witness_check import verify_witness

    inp = _parse(json.loads(Path(args[0]).read_text()))
    out_path = Path(args[1])
    params = _load_params(args, 2)
    eng = RollupEngine(*params)
    t0 = time.time()
    names, values = wv.export_witness(eng, inp)
    dt = time.time() - t0
    sym_path = out_path.with_suffix(out_path.suffix + ".sym.json")
    wv.write_wtns(out_path, values)
    wv.write_sym(sym_path, names)
    loaded = wv.load_witness(out_path, sym_path)
    res = verify_witness(loaded, *params)
    print(f"wrote {out_path} ({len(values)} signals, {dt:.3f}s) + "
          f"{sym_path.name}")
    print(f"re-verified from file: {res['n_checked']} relations, "
          f"{'ALL SATISFIED' if res['ok'] else 'FAILURES: ' + str(res['failures'][:5])}")
    sys.exit(0 if res["ok"] else 1)


def cmd_check(args):
    from circuits_tpu.engine.witness import RollupEngine

    inp = _parse(json.loads(Path(args[0]).read_text()))
    params = _load_params(args, 1)
    eng = RollupEngine(*params)
    out, ok = eng.run(inp)
    print(f"constraints {'SATISFIED' if ok else 'FAILED'}")
    sys.exit(0 if ok else 1)


def cmd_trace(args):
    """printSignals equivalent (reference test/helpers/helpers.js:168-188):
    dump every cataloged internal signal — or one named signal — per lane."""
    from circuits_tpu.engine.witness import RollupEngine

    inp = _parse(json.loads(Path(args[0]).read_text()))
    params = _load_params(args, 1)
    eng = RollupEngine(*params)
    if len(args) > 5:
        name = args[5]
        print(json.dumps({name: _stringify(eng.get_signal(inp, name))}))
        return
    tr = eng.trace(inp)
    print(json.dumps(_stringify(tr), indent=1))


def cmd_audit(_args):
    from circuits_tpu.r1cs.audit import report

    print(report())


def cmd_out_of_scope(verb):
    def fn(_args):
        raise SystemExit(
            f"'{verb}' is out of scope by design: this framework replaces "
            "the reference's witness generation and constraint checking "
            "(layers L1-L5 + the witness-validity half of L6, SURVEY.md "
            "§1); Groth16 setup/proving and Solidity verifier export "
            "remain snarkjs's job (reference tools/helpers/"
            "actions.js:148-205) and consume this engine's witness "
            "output unchanged.")
    return fn


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return
    verb, args = argv[0], argv[1:]
    fn = {"create": cmd_create, "compile": cmd_compile,
          "compilewitness": cmd_compile,
          "input": cmd_input, "witness": cmd_witness,
          "witnessfull": cmd_witnessfull,
          "check": cmd_check, "trace": cmd_trace, "audit": cmd_audit,
          "zkey": cmd_out_of_scope("zkey"),
          "solidity": cmd_out_of_scope("solidity")}.get(verb)
    if fn is None:
        raise SystemExit(f"unknown verb {verb!r}")
    fn(args)


if __name__ == "__main__":
    main()
