"""Isolated s0-bundle shootout for the HiFi-Codec encoder (round 3).

The encoder profile (benchmarks/hifienc_stage_probe.py) puts ~21 ms of the
34 ms encode in the s0 resblock+GroupNorm bundle ([8, 120000, 64], 23% of
bf16 peak), yet the whole-encoder fused variant measured a net LOSS
(benchmarks/hificodec_probe.py fused_enc_folded). This probe isolates why:
it times, at exactly the s0 shape,

  1. the unfused XLA bundle (EncBundle, what the packed encoder runs),
  2. ``resblock_tower_gn`` (the moments-based fused bundle), and
  3. ``resblock_tower`` (the generator's no-GN tower — same chains, no
     moments/second pass; NOT numerically equivalent, pure speed bound),

so the fused-kernel cost splits into "tower itself" vs "GN moments + f32
recombination pass" vs "stage wiring/relayout" (the remainder seen
end-to-end). Reference surface: models.py:405-416.

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/encbundle_fused_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.ops.pallas.resblock import resblock_tower, resblock_tower_gn
from benchmarks.hifienc_stage_probe import EncBundle, bench


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    B, T, C = 8, 120000, 64
    cfg = HiFiCodecConfig()
    rks = tuple(reversed(cfg.resblock_kernel_sizes))
    rds = tuple(tuple(d) for d in reversed(cfg.resblock_dilation_sizes))
    x = (jax.random.normal(jax.random.PRNGKey(0), (B, T, C)) * 0.3).astype(jnp.bfloat16)

    results = {}

    # ---- 1. unfused XLA bundle (weight-norm folded to plain, like serving)
    mod = EncBundle(channels=C, norm="none")
    vs = jax.jit(mod.init)(jax.random.PRNGKey(1), x[:1])
    f_xla = jax.jit(lambda v, a: mod.apply(v, a))
    t = bench(f_xla, vs, x)
    results["xla_bundle_ms"] = round(t * 1000, 3)

    # pull the conv weights/biases + GN affines out of the module tree so the
    # tower calls read the SAME parameters (parity checked below)
    p = vs["params"]
    ws, bs = [], []
    for g in range(len(rks)):
        wg, bg = [], []
        rb = p[f"resblocks_{g}"]
        n_d = len(rds[g])
        for i in range(2 * n_d):
            which = "convs1" if i % 2 == 0 else "convs2"
            idx = i // 2
            conv = rb[f"{which}_{idx}"]  # norm="none": kernel/bias inline
            wg.append(jnp.asarray(conv["kernel"], jnp.bfloat16))
            bg.append(jnp.asarray(conv["bias"], jnp.float32))
        ws.append(tuple(wg))
        bs.append(tuple(bg))
    ws, bs = tuple(ws), tuple(bs)
    scs = jnp.stack([jnp.asarray(p[f"normalize_{g}"]["scale"]) for g in range(3)])
    gbs = jnp.stack([jnp.asarray(p[f"normalize_{g}"]["bias"]) for g in range(3)])

    # ---- 2. fused GN tower ------------------------------------------------
    f_gn = jax.jit(
        lambda a: resblock_tower_gn(
            a, ws, bs, scs, gbs, kernel_sizes=rks, dilation_sizes=rds,
            resblock=cfg.resblock, num_groups=C // 16, epsilon=1e-6,
        )
    )
    t = bench(f_gn, x)
    results["fused_gn_tower_ms"] = round(t * 1000, 3)

    # parity vs the XLA bundle at serving dtype
    ref = np.asarray(f_xla(vs, x[:2]), np.float32)
    got = np.asarray(f_gn(x[:2]), np.float32)
    results["fused_gn_max_delta"] = float(np.max(np.abs(ref - got)))

    # ---- 3. no-GN tower (speed bound for the chains alone) ---------------
    f_plain = jax.jit(
        lambda a: resblock_tower(
            a, ws, bs, kernel_sizes=rks, dilation_sizes=rds,
            resblock=cfg.resblock,
        )
    )
    t = bench(f_plain, x)
    results["plain_tower_ms"] = round(t * 1000, 3)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
