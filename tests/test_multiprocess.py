"""Two-process distributed inference test (multi-host stand-in).

Launches two fresh CPU-only jax processes that form a jax.distributed
cluster (gloo collectives, 4 virtual devices each = 8 global), run
batch-sharded inference over the global mesh, and cross-check against
single-process results -- the SURVEY.md §4 multi-process tier.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.normpath(os.path.join(os.path.dirname(__file__), ".."))
WORKER = os.path.join(ROOT, "scripts", "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode: str):
    coord = f"127.0.0.1:{_free_port()}"
    # strip platform overrides AND the axon sitecustomize path so the
    # workers are pure-CPU jax processes
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(i), mode],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and ("gloo" in out.lower() or "collectives" in out.lower()):
            pytest.skip(f"CPU collectives unavailable: {out[-400:]}")
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i}: OK" in out


@pytest.mark.slow
def test_two_process_data_parallel_inference():
    _run_workers("infer")


@pytest.mark.slow
def test_two_process_tensor_parallel_train_step():
    """TP train step whose psum crosses the process boundary: the FC
    weight matrix is row-sharded over a ``model`` mesh axis that pairs
    one device from each process; updated params/grads must be bit-equal
    to the single-process replicated step (round-4 VERDICT task 7)."""
    _run_workers("train_tp")
