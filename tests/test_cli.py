"""CLI bin coverage: run each console driver in-process (main(argv))
on tiny problems (reference: russell_sparse/src/bin/solve_matrix_market
.rs, mem_check.rs; russell_ode/src/bin/brusselator_pde.rs,
amplifier1t.rs). These are the L4 entry points — previously only
exercised as subprocesses outside coverage."""

import json

import numpy as np
import pytest


def test_cli_solve_matrix_market_bfwb62(capsys):
    from russell_tpu.bin import solve_matrix_market as cli
    rc = cli.main(["/root/reference/russell_sparse/data/matrix_market/"
                   "bfwb62.mtx", "--genie", "splu", "--determinant"])
    assert rc == 0
    out = capsys.readouterr().out
    rec = json.loads(out[out.index("{"):])
    assert rec["verify"]["relative_error"] < 1e-10
    # the componentwise bfwb62 oracle is asserted inside main


def test_cli_solve_matrix_market_dense_and_flags(capsys):
    from russell_tpu.bin import solve_matrix_market as cli
    rc = cli.main(["/root/reference/russell_sparse/data/matrix_market/"
                   "bfwb62.mtx", "--genie", "dense",
                   "--scaling", "max", "--verbose"])
    assert rc == 0


def test_cli_mem_check(capsys):
    from russell_tpu.bin import mem_check as cli
    rc = cli.main([])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ok" in out.lower() or "pass" in out.lower() or len(out) > 0


def test_cli_brusselator_pde_small(capsys):
    from russell_tpu.bin import brusselator_pde as cli
    rc = cli.main(["--npoint", "9", "--tol", "1e-4", "--tf", "0.2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "steps" in out or "n_steps" in out or len(out) > 0


def test_cli_amplifier1t(capsys):
    from russell_tpu.bin import amplifier1t as cli
    rc = cli.main(["--tf", "0.002"])
    assert rc == 0
