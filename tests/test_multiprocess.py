"""TRUE multi-process distributed tests: 2 processes x 4 virtual CPU devices
via jax.distributed.initialize on localhost (VERDICT r1 item 4 — everything
multi-host previously only ever executed with process_count() == 1).

Each test launches tests/_mp_worker.py twice, waits, and asserts:
  * both processes finish (the collectives matched — a mismatched program
    deadlocks and hits the timeout instead);
  * replicated metrics (losses, eval scalars, h@k) are IDENTICAL on both
    processes — the single-controller contract;
  * only process 0 wrote checkpoints.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_procs(tmp_path, stage: str, timeout: int = 600):
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)   # escape any sitecustomize platform pinning
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(i), str(tmp_path), stage],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(
                "worker deadlocked (mismatched collectives across processes?)"
            )
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {i}" in out, out[-1000:]
    recs = []
    for i in range(2):
        with open(os.path.join(tmp_path, f"metrics_p{i}.json")) as f:
            recs.append(json.load(f))
    return recs


def _common_scalars(recs):
    """(key, step) -> [v_p0, v_p1] for metrics present on both processes."""
    by_proc = []
    for r in recs:
        d = {}
        for rec in r:
            for k, v in rec.items():
                if k != "step":
                    d[(k, rec["step"])] = v
        by_proc.append(d)
    keys = set(by_proc[0]) & set(by_proc[1])
    assert keys, "no overlapping metrics between processes"
    return {k: (by_proc[0][k], by_proc[1][k]) for k in keys}


def test_two_process_rqvae_train(tmp_path):
    recs = _run_two_procs(tmp_path, "rqvae")
    scalars = _common_scalars(recs)
    # replicated train/eval losses must agree bit-for-bit-ish across hosts
    for (k, step), (a, b) in scalars.items():
        if "examples_per_s" in k:
            continue  # wall-clock, process-local by nature
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=f"{k}@{step}")
    # diversity metrics ran on process 0 only
    p0_keys = {k for rec in recs[0] for k in rec}
    p1_keys = {k for rec in recs[1] for k in rec}
    assert "rqvae_entropy" in p0_keys
    assert "rqvae_entropy" not in p1_keys
    # process-0-only checkpoint
    steps = os.listdir(os.path.join(tmp_path, "rq"))
    assert any(s.startswith("step_") for s in steps)
    losses = [r["total_loss"] for r in recs[0] if "total_loss" in r]
    assert np.isfinite(losses).all()


def test_two_process_decoder_train(tmp_path):
    recs = _run_two_procs(tmp_path, "decoder", timeout=900)
    scalars = _common_scalars(recs)
    for (k, step), (a, b) in scalars.items():
        if "examples_per_s" in k or "seq_length" in k:
            continue  # wall-clock / host-local logging quantiles
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=f"{k}@{step}")
    # generative eval ran and agreed: h@k present in both
    assert any(k == "h@4_slice_:4" or k.startswith("h@")
               for (k, _) in scalars), sorted({k for k, _ in scalars})[:20]
    assert os.path.isdir(os.path.join(tmp_path, "dec"))


def test_env_auto_init_two_processes(tmp_path):
    """maybe_init_distributed must self-initialize from env vars alone
    (regression: calling jax.process_count() before initialize() makes
    auto-init silently impossible — each host would train independently)."""
    coord = f"localhost:{_free_port()}"
    env_base = dict(os.environ)
    env_base.pop("PYTHONPATH", None)
    env_base["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(REPO, "tests", "_mp_envinit_worker.py")
    procs = []
    for i in range(2):
        env = dict(env_base)
        env["JAX_COORDINATOR_ADDRESS"] = coord
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, worker],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO,
        ))
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError("env auto-init worker hung")
        assert p.returncode == 0, f"worker {i} failed:\n{out.decode()[-2000:]}"
        assert f"ENVINIT_OK {i}" in out.decode()
