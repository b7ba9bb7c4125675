"""CLI end-to-end: input -> witness -> check -> trace -> audit (the
build-circuit.js verb surface, reference tools/build-circuit.js:32-48)."""

import json
import os

import pytest

from circuits_tpu.tools import cli

PARAMS = ["4", "16", "4", "2"]  # nTx nLevels maxL1Tx maxFeeTx


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


def test_cli_pipeline(workdir, capsys):
    cli.main(["create"] + PARAMS)
    assert (workdir / "rollup-4-16-4-2" / "config.json").exists()

    # 4 accounts via one L1 batch, 2 transfers
    cli.main(["input", "4", "2"] + PARAMS)
    out = capsys.readouterr().out
    expected_hash = int(out.strip().rsplit("= ", 1)[1].rstrip(")"))
    inp = workdir / "inputs-4.json"
    assert inp.exists()

    cli.main(["witness", str(inp), str(workdir / "out.json")] + PARAMS)
    res = json.loads((workdir / "out.json").read_text())
    assert res["ok"] is True
    assert int(res["outputs"]["hash_global_inputs"]) == expected_hash

    with pytest.raises(SystemExit) as e:
        cli.main(["check", str(inp)] + PARAMS)
    assert e.value.code == 0

    cli.main(["trace", str(inp)] + PARAMS + ["decode.tokenID"])
    traced = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert traced["decode.tokenID"] == ["1", "1", "0", "0"]

    cli.main(["audit"])
    assert "audit: OK" in capsys.readouterr().out

    # witnessfull: export the full vector, self-verifies from file alone
    with pytest.raises(SystemExit) as e:
        cli.main(["witnessfull", str(inp), str(workdir / "full.wtns")]
                 + PARAMS)
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "ALL SATISFIED" in out
    assert (workdir / "full.wtns").exists()
    assert (workdir / "full.wtns.sym.json").exists()

    with pytest.raises(SystemExit):
        cli.main(["zkey"])
