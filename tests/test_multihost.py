"""2-process multi-host smoke test.

Runs the real ``jax.distributed.initialize`` path over a local coordinator:
two OS processes, each a "host" with 2 virtual CPU devices, forming one
4-device global mesh. Exercises ``shard_batch``'s
``make_array_from_process_local_data`` branch (dead code in every
single-process test) plus the rank-aware index partition — the analogue of
the reference's NCCL init + DistributedSampler (main_launch.py:163-166,
220-227). See tests/multihost_worker.py for the worker body.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int = 2):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))
    # the worker forces the cpu platform itself; drop any pinned platform
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(nproc)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        # generous: ~270 s standalone at 2 procs, but the full suite's own
        # compiles compete for CPU, and 4 procs compile concurrently on
        # what may be a single core
        out, _ = p.communicate(timeout=3000)
        outs.append(out)
    return procs, outs


def _run_and_check(nproc: int) -> float:
    procs, outs = _run_workers(nproc)
    if any(p.returncode != 0 for p in procs):
        # full worker logs survive even when the pytest summary is truncated
        with open("/tmp/multihost_failure.log", "w") as fh:
            for pid, out in enumerate(outs):
                fh.write(f"===== worker {pid} (rc={procs[pid].returncode}) =====\n{out}\n")
        if any("DEADLINE_EXCEEDED" in out for out in outs):
            # Gloo's first-collective rendezvous has a hard ~30 s key-value
            # timeout; the worker minimizes the window (AOT compile + gRPC
            # barrier before the first execution), but a maximally-loaded
            # host can still blow it between barrier-release and the Gloo
            # context init. Environmental, not a product defect: retry once.
            procs, outs = _run_workers(nproc)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid}/{nproc} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=\d+ loss_g=([\d.]+)", out)
        assert m, out
        losses.append(float(m.group(1)))
    # one global batch -> every host must report the identical global loss
    assert len(set(losses)) == 1, losses
    return losses[0]


@pytest.mark.slow
def test_two_and_four_process_distributed_train_step():
    """2-host (2x2 devices) AND 4-host (4x2 devices) topologies over the
    SAME fixed 8-row global batch: within a run every host must report the
    identical global loss, and across topologies the losses must agree to
    reduction-order tolerance (the global computation is topology-
    invariant; only the psum partition order differs)."""
    loss2 = _run_and_check(2)
    loss4 = _run_and_check(4)
    assert loss4 == pytest.approx(loss2, rel=2e-4), (loss2, loss4)
