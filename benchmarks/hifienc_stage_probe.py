"""Per-stage breakdown of the HiFi-Codec encoder (round 3).

Companion to hifigen_stage_probe.py: decomposes the ~34 ms packed encode
(BENCHMARKS.md "HiFi-Codec serving") into conv_pre / per-stage downsample
conv / per-stage resblock+GroupNorm bundle / conv_post segments, each timed
as a standalone jit. The encoder (reference models.py:392-418) mirrors the
generator with strided convs and normalizes the ACCUMULATED resblock sum
after every block, so each bundle is 3x(resblock + GroupNorm(ch//16)).

Segment shapes (24k_320d, batch 8 x 10 s = 240k samples):
  conv_pre  [8, 240000, 1] k7 -> 32        (packed p=8 in the auto policy)
  s0 conv 32-> 64  k4  s2 -> [8, 120000, 64];  bundle C=64  (packed)
  s1 conv 64->128  k8  s4 -> [8,  30000, 128]; bundle C=128
  s2 conv 128->256 k11 s5 -> [8,   6000, 256]; bundle C=256
  s3 conv 256->512 k16 s8 -> [8,    750, 512]; bundle C=512
  conv_post [8, 750, 512] k3

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/hifienc_stage_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from academicodec_tpu.nn.conv import Conv1d
from academicodec_tpu.nn.hifigan import (
    GroupNormTorch,
    HiFiCodecConfig,
    ResBlock1,
    _lrelu,
)
from academicodec_tpu.ops import packed as packed_ops

PEAK_BF16 = 197e12  # v5e MXU peak FLOP/s


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][..., :1])


def bench(fn, *args, iters=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


class EncBundle(nn.Module):
    """The 3x(resblock + GroupNorm-of-accumulated-sum) bundle at one
    encoder stage (reference models.py:405-416)."""

    channels: int
    norm: str = "weight_norm"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = HiFiCodecConfig()
        rks = list(reversed(cfg.resblock_kernel_sizes))
        rds = list(reversed(cfg.resblock_dilation_sizes))
        xs = None
        for j, (rk, rd) in enumerate(zip(rks, rds)):
            r = ResBlock1(
                channels=self.channels, kernel_size=rk, dilation=tuple(rd),
                norm=self.norm, dtype=self.dtype, name=f"resblocks_{j}",
            )(x)
            xs = r if xs is None else xs + r
            xs = GroupNormTorch(
                num_groups=self.channels // 16, channels=self.channels,
                epsilon=1e-6, dtype=self.dtype, name=f"normalize_{j}",
            )(xs)
        return packed_ops.maybe_map(lambda v: v / 3.0, xs)


class DownSeg(nn.Module):
    """lrelu + strided downsample conv at one encoder stage."""

    cin: int
    cout: int
    k: int
    u: int
    norm: str = "weight_norm"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = _lrelu(x)
        return Conv1d(
            in_channels=self.cin, out_channels=self.cout, kernel_size=self.k,
            stride=self.u, padding=((self.k - self.u) // 2,) * 2,
            norm=self.norm, dtype=self.dtype, name="ups",
        )(x)


class PrePost(nn.Module):
    cin: int
    cout: int
    k: int = 7
    norm: str = "weight_norm"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return Conv1d(
            in_channels=self.cin, out_channels=self.cout, kernel_size=self.k,
            padding=(self.k // 2,) * 2, norm=self.norm, dtype=self.dtype,
            name="conv",
        )(x)


def fold_params(variables):
    from academicodec_tpu.utils.fold import fold_weight_norm

    return {"params": fold_weight_norm(variables["params"])}


def time_segment(name, module, x, results, flop=None, packed_p=None):
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x[:1, :640])
    f = jax.jit(lambda v, z: module.apply(v, z))
    t = bench(f, variables, x)
    results[f"{name}_ms"] = round(t * 1e3, 3)
    if flop:
        results[f"{name}_pct_peak"] = round(100 * flop / t / PEAK_BF16, 1)
    if packed_p is not None:
        fp = jax.jit(
            lambda v, z: packed_ops.unpack_t(
                module.apply(v, packed_ops.pack_t(z, packed_p))
            )
        )
        t2 = bench(fp, variables, x)
        results[f"{name}_packed_ms"] = round(t2 * 1e3, 3)
        if flop:
            results[f"{name}_packed_pct_peak"] = round(
                100 * flop / t2 / PEAK_BF16, 1
            )
    print(json.dumps({k: v for k, v in results.items() if k.startswith(name)}),
          flush=True)


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    B, T = 8, 240000
    key = jax.random.PRNGKey(1)
    results = {}

    idop = jax.jit(lambda z: z + 1.0)
    results["dispatch_floor_ms"] = round(bench(idop, jnp.zeros((8, 8), jnp.bfloat16)) * 1e3, 3)

    def rnd(shape):
        return (jax.random.normal(key, shape) * 0.1).astype(jnp.bfloat16)

    # conv_pre (C=1 -> 32 at waveform rate; packed p=8 in the auto policy)
    x = rnd((B, T, 1))
    flop = 2 * 7 * 1 * 32 * T * B
    time_segment("conv_pre", PrePost(cin=1, cout=32), x, results, flop=flop,
                 packed_p=8)

    stages = [
        (0, 32, 64, 4, 2, T, 8),
        (1, 64, 128, 8, 4, T // 2, 8),
        (2, 128, 256, 11, 5, T // 8, None),
        (3, 256, 512, 16, 8, T // 40, None),
    ]
    for si, cin, cout, k, u, tin, p in stages:
        x = rnd((B, tin, cin))
        tout = tin // u
        flop = 2 * k * cin * cout * tout * B
        time_segment(f"s{si}_down", DownSeg(cin=cin, cout=cout, k=k, u=u),
                     x, results, flop=flop, packed_p=p)
        y = rnd((B, tout, cout))
        flop_b = 2 * 6 * (3 + 7 + 11) * cout * cout * tout * B
        # GroupNorm over full T prevents lanes-packing the bundle (stats
        # would mix junk rows) — packed variant only where the auto policy
        # actually applies (C<=64, handled inside Encoder via pack regions)
        time_segment(f"s{si}_bundle", EncBundle(channels=cout), y, results,
                     flop=flop_b, packed_p=(8 // u if p else None))

    # conv_post (C=512, k3, latent rate)
    x = rnd((B, 750, 512))
    flop = 2 * 3 * 512 * 512 * 750 * B
    time_segment("conv_post", PrePost(cin=512, cout=512, k=3, norm="none"),
                 x, results, flop=flop)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
