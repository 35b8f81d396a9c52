"""CLI tools black-box tests (the reference's CTest style: run the tool
as a process, feed a fixture on stdin, check output)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from spasm_tpu import sio

ENV = dict(os.environ,
           JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8",
           PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))


def run_tool(tool, args, stdin_file=None, stdin_data=None):
    cmd = [sys.executable, "-m", f"spasm_tpu.cli.{tool}"] + args
    if stdin_file is not None:
        stdin_data = open(stdin_file, "rb").read()
    return subprocess.run(cmd, input=stdin_data, capture_output=True,
                          env=ENV, timeout=600)


def test_rank_tool(matrix_dir):
    r = run_tool("rank", ["--modulus", "257"],
                 stdin_file=matrix_dir / "singular.sms")
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout.decode().strip() == "15"


def test_rank_tool_transposes_wide(matrix_dir):
    r = run_tool("rank", [], stdin_file=matrix_dir / "rectangular_l.sms")
    assert r.returncode == 0, r.stderr.decode()
    assert b"transposing" in r.stderr


def test_rank_certificate_flow(matrix_dir, tmp_path):
    cert = tmp_path / "cert.txt"
    r = run_tool("rank", ["--modulus", "257", "-c", "-o", str(cert)],
                 stdin_file=matrix_dir / "singular.sms")
    assert r.returncode == 0, r.stderr.decode()
    assert b"CORRECT certificate" in r.stderr
    assert cert.exists()
    r2 = run_tool("check_cert", ["--modulus", "257", "-c", str(cert)],
                  stdin_file=matrix_dir / "singular.sms")
    assert r2.returncode == 0, r2.stderr.decode()
    assert b"CORRECT" in r2.stderr
    # wrong matrix -> incorrect
    r3 = run_tool("check_cert", ["--modulus", "257", "-c", str(cert)],
                  stdin_file=matrix_dir / "small.sms")
    assert r3.returncode == 1


def test_echelonize_tool(matrix_dir, tmp_path):
    r = run_tool("echelonize", ["--modulus", "257"],
                 stdin_file=matrix_dir / "small.sms")
    assert r.returncode == 0, r.stderr.decode()
    out = tmp_path / "U.sms"
    out.write_bytes(r.stdout)
    U, _ = sio.load_csr(out, 257)
    assert U.n <= U.m


def test_kernel_tool(matrix_dir, tmp_path):
    r = run_tool("kernel", ["--modulus", "257"],
                 stdin_file=matrix_dir / "singular.sms")
    assert r.returncode == 0, r.stderr.decode()
    out = tmp_path / "K.sms"
    out.write_bytes(r.stdout)
    K, _ = sio.load_csr(out, 257)
    assert K.n == 1      # singular.sms has rank 15, 16 columns


def test_solve_tool(matrix_dir, tmp_path):
    r = run_tool("solve",
                 ["--modulus", "257", "--rhs",
                  str(matrix_dir / "singular.sms")],
                 stdin_file=matrix_dir / "singular.sms")
    assert r.returncode == 0, r.stderr.decode()


def test_dm_tool(matrix_dir):
    r = run_tool("dm", ["-v"], stdin_file=matrix_dir / "dm.sms")
    assert r.returncode == 0, r.stderr.decode()
    assert b"structural rank" in r.stdout


def test_stack_tool(matrix_dir):
    # build an input with an empty row/column
    data = b"3 3 M\n1 1 1\n3 3 1\n0 0 0\n"
    r = run_tool("stack", [], stdin_data=data)
    assert r.returncode == 0, r.stderr.decode()
    assert b"2 2 M" in r.stdout


def test_vertical_swap_roundtrip(matrix_dir):
    raw = (matrix_dir / "small.sms").read_bytes()
    r1 = run_tool("vertical_swap", [], stdin_data=raw)
    r2 = run_tool("vertical_swap", [], stdin_data=r1.stdout)
    import io
    A, _ = sio.load_csr(io.BytesIO(raw), 42013)
    B, _ = sio.load_csr(io.BytesIO(r2.stdout), 42013)
    assert np.array_equal(A.todense(), B.todense())


def test_transpose_tool(matrix_dir):
    r = run_tool("transpose", [], stdin_file=matrix_dir / "small.sms")
    assert r.returncode == 0, r.stderr.decode()
    import io
    A, _ = sio.load_csr(matrix_dir / "small.sms", 42013)
    T, _ = sio.load_csr(io.BytesIO(r.stdout), 42013)
    assert np.array_equal(A.todense().T, T.todense())


def test_bitmap_tool(matrix_dir):
    r = run_tool("bitmap", ["--width", "10", "--height", "10"],
                 stdin_file=matrix_dir / "medium.sms")
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout.startswith(b"P1")
    r = run_tool("bitmap", ["--gray", "-W", "10", "-H", "10"],
                 stdin_file=matrix_dir / "medium.sms")
    assert r.stdout.startswith(b"P2")
