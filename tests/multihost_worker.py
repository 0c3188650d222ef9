"""Worker for the multi-host smoke tests (tests/test_multihost.py).

Each process is one "host" with 2 virtual CPU devices; the test runs the
same fixed 8-row global batch at BOTH 2-process (4-device) and 4-process
(8-device) topologies and asserts cross-topology loss agreement. This
executes the REAL multi-host code path the
single-process tests can't reach: ``jax.distributed.initialize`` over a local
coordinator and ``shard_batch``'s ``make_array_from_process_local_data``
branch (parallel/mesh.py), fed by the rank-aware ``batch_iterator`` slice —
the TPU-native analogue of the reference's NCCL init + DistributedSampler
(main_launch.py:163-166, 220-227).

Usage: python multihost_worker.py <coordinator_port> <process_id> <num_processes>
"""

import os
import sys


def _rendezvous(name: str) -> None:
    """Align both processes on the coordination-service barrier (gRPC,
    explicit timeout — no Gloo). Gloo's first-collective rendezvous has a
    hard ~30 s key-value timeout, so every *first* collective of a clique
    must be reached by all processes within that window; XLA compile skew
    on a loaded (or single-core) host easily exceeds it. Call this right
    before any such point."""
    try:
        # private API (jax._src); guarded so a jax upgrade degrades to a
        # direct execute (risking only the Gloo-rendezvous flake this
        # barrier papers over) instead of breaking the test opaquely
        from jax._src import distributed as _jdist

        _jdist.global_state.client.wait_at_barrier(name, timeout_in_ms=1_200_000)
    except Exception as e:  # pragma: no cover - jax-version dependent
        print(f"barrier unavailable ({e!r}); proceeding directly", flush=True)


def main() -> None:
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    # the first collective's Gloo rendezvous defaults to a 30 s KV timeout;
    # compile skew between the two workers (first run or cold cache, CPU
    # contention from the surrounding suite) easily exceeds it — raise it
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_collective_timeout_seconds=1200"
        # in-process rendezvous between this worker's 2 local devices: XLA
        # aborts if a participant is >40 s late, which CPU contention from
        # the surrounding suite can cause
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    # OWN cache dir, NOT the suite's: the AOT-compiled step written here
    # (.lower().compile()) serializes with host-specific machine
    # features; deserializing such entries from the shared cache in a
    # later process has been observed to SEGFAULT inside
    # backend.deserialize_executable (jax warns "could lead to execution
    # errors such as SIGILL" on the feature mismatch). The helper adds a
    # host-CPU fingerprint on top — the same entries go stale when the VM
    # live-migrates between physical hosts (utils/xla_cache.py).
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache("/tmp/academicodec_tpu_xla_cache_mh")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    import numpy as np

    from academicodec_tpu.data.dataset import shard_indices
    from academicodec_tpu.parallel import make_mesh, replicate, shard_batch
    from academicodec_tpu.train.encodec import EncodecTrainConfig, EncodecTrainer

    # every process computes the same permutation and takes its rank slice
    rng_np = np.random.default_rng(0)
    perm = rng_np.permutation(8)
    mine = shard_indices(perm, pid, nproc)
    assert len(mine) == 8 // nproc

    mesh = make_mesh()
    cfg = EncodecTrainConfig(
        sr=16000,
        ratios=(8, 5, 4, 2),
        target_bandwidths=(1, 2, 4),
        n_filters=4,
        dimension=32,
        bins=64,
        discriminator_iter_start=1,
        mel_scale_powers=(6, 7),
        stft_filters=8,
        stft_n_ffts=(256,),
        mpd_periods=(2, 3),
        msd_scales=1,
    )
    trainer = EncodecTrainer(cfg)

    rng = jax.random.PRNGKey(0)
    # deterministic FIXED global batch (8 rows, row i = i/10) regardless of
    # process count: each host materializes ONLY its local rows, global
    # assembly is make_array_from_process_local_data. Because the global
    # computation is identical at any topology, the reported loss must
    # agree between the 2-process and 4-process runs (test_multihost.py).
    global_bs = 8
    k = global_bs // nproc
    local_rows = np.arange(pid * k, (pid + 1) * k)
    local = (local_rows[:, None] / 10.0 * np.ones((1, 3200))).astype(np.float32)

    state = trainer.init_state(rng, np.zeros((global_bs, 3200), np.float32))
    # replicate()'s device_put to a multi-process sharding runs an internal
    # multihost_utils.assert_equal -> process allgather: the FIRST Gloo
    # collective of the run, reached skewed by the init_state compile above
    # (observed blowing the 30 s window on a 1-core host). Realign first.
    _rendezvous("state_initialized")
    state = replicate(state, mesh)
    sharded = shard_batch(local, mesh)
    assert sharded.shape == (global_bs, 3200), sharded.shape

    # The step's psums span the 4-device clique (a different Gloo context
    # from the 2-process allgather above, so a fresh rendezvous): AOT-compile
    # WITHOUT executing, realign, and only then execute — both processes hit
    # the Gloo init within milliseconds of each other. (unbound form: .lower
    # bypasses the bound-method descriptor, so the static self argument is
    # passed explicitly)
    compiled = type(trainer).train_step.lower(trainer, state, sharded).compile()
    _rendezvous("step_compiled")
    state, metrics = compiled(state, sharded)
    loss = float(np.asarray(metrics["loss_g"]))
    assert np.isfinite(loss), metrics
    # all hosts must agree on the global loss (one global batch, psum'd stats)
    print(f"MULTIHOST_OK pid={pid} loss_g={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
