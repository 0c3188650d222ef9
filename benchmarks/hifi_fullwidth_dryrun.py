"""Flagship-width HiFi-Codec sharded GAN step on a virtual CPU mesh.

Segment (b) of the driver's multichip dryrun, run SUBPROCESS-ISOLATED by
``__graft_entry__.dryrun_multichip`` (the CLAUDE.md isolation pattern):
the round-3 in-process attempt aborted inside XLA:CPU after other large
sharded graphs had compiled in the same process, while a fresh process
compiles AND executes this graph cleanly at 4 and 8 virtual devices
(round 4, loss_gen_all ~396.0 both sizes). Config must stay byte-identical
between runs so the AOT cache (repo-local benchmarks/xla_cache_dryrun*,
persisted across driver sessions; ACADEMICODEC_DRYRUN_CACHE overrides) is
shared with the driver's invocation.

Usage: python benchmarks/hifi_fullwidth_dryrun.py [n_devices]
(standalone runs insert the repo root on sys.path below; the driver path
injects PYTHONPATH itself)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_devices = int(sys.argv[1]) if len(sys.argv) > 1 else 4
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n_devices)
assert jax.devices()[0].platform == "cpu"

from academicodec_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache(os.environ.get(
    "ACADEMICODEC_DRYRUN_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks", "xla_cache_dryrun"),
))

from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.parallel import make_mesh, replicate, shard_batch
from academicodec_tpu.train.hificodec import HiFiCodecTrainConfig, HiFiCodecTrainer

mesh = make_mesh(jax.devices("cpu")[:n_devices])
rng = jax.random.PRNGKey(0)
# FULL width: reference config_24k_320d.json (upsample_initial_channel 512,
# encoder base 32, full MPD/MSD/MS-STFT discriminators)
hcfg = HiFiCodecTrainConfig(model=HiFiCodecConfig(segment_size=3200))
trainer = HiFiCodecTrainer(hcfg)
batch = jax.random.normal(jax.random.PRNGKey(1), (n_devices, 3200)) * 0.1
state = trainer.init_state(rng, batch)
state = replicate(state, mesh)
state, metrics = trainer.train_step(state, shard_batch(batch, mesh))
jax.block_until_ready(metrics["loss_gen_all"])
assert jnp.isfinite(metrics["loss_gen_all"]), metrics
print(f"FULL-WIDTH-OK n_devices={n_devices} "
      f"loss={float(metrics['loss_gen_all']):.3f}")
