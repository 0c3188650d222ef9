"""Per-stage breakdown of the HiFi-GAN generator decode path (round 3).

Decomposes the 48.9 ms packed decode (BENCHMARKS.md "HiFi-Codec serving")
into conv_pre / per-stage upsample convT / per-stage resblock bundle /
conv_post segments, each timed as a standalone jit with the relay dispatch
floor measured and subtracted. Variants per segment: plain, lanes-packed at
the auto-policy factor (stage-2 p=4, stage-3 p=8), and weight-norm folded
(norm='none' with pre-folded kernels — the serving configuration the CLIs
expose via --fold_weight_norm but the round-2 benches never used).

Segment shapes (24k_320d, batch 8 x 10 s):
  conv_pre  [8,  750, 512] k7
  s0 convT 512->256 k16 s8 -> [8, 6000, 256]; bundle 3xResBlock1 C=256
  s1 convT 256->128 k11 s5 -> [8, 30000, 128]; bundle C=128
  s2 convT 128-> 64 k8  s4 -> [8,120000,  64]; bundle C=64  (packed p=4)
  s3 convT  64-> 32 k4  s2 -> [8,240000,  32]; bundle C=32  (packed p=8)
  conv_post [8,240000,32] k7 -> 1, tanh

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/hifigen_stage_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.conv import Conv1d, ConvTranspose1d
from academicodec_tpu.nn.hifigan import HiFiCodecConfig, ResBlock1, _lrelu
from academicodec_tpu.ops import packed as packed_ops

PEAK_BF16 = 197e12  # v5e MXU peak FLOP/s


def _sync(out):
    """Wait for completion via a TINY host fetch (block_until_ready returns
    early on the relay; fetching the full output would bill tens of ms of
    relay transfer to the measurement — see bench.py)."""
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


import flax.linen as nn  # noqa: E402


class ResBundle(nn.Module):
    """The 3-resblock mean bundle at one generator stage."""

    channels: int
    norm: str = "weight_norm"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = HiFiCodecConfig()
        xs = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            r = ResBlock1(
                channels=self.channels, kernel_size=rk, dilation=tuple(rd),
                norm=self.norm, dtype=self.dtype, name=f"resblocks_{j}",
            )(x)
            xs = r if xs is None else xs + r
        return packed_ops.maybe_map(lambda v: v / 3.0, xs)


class UpsSeg(nn.Module):
    """lrelu + upsample convT at one stage."""

    cin: int
    cout: int
    k: int
    u: int
    norm: str = "weight_norm"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = _lrelu(x)
        return ConvTranspose1d(
            in_channels=self.cin, out_channels=self.cout, kernel_size=self.k,
            stride=self.u, padding=((self.k - self.u) // 2,) * 2,
            norm=self.norm, dtype=self.dtype, name="ups",
        )(x)


class PrePost(nn.Module):
    cin: int
    cout: int
    norm: str = "weight_norm"
    tanh: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = Conv1d(
            in_channels=self.cin, out_channels=self.cout, kernel_size=7,
            padding=(3, 3), norm=self.norm, dtype=self.dtype, name="conv",
        )(x)
        if self.tanh:
            x = packed_ops.maybe_map(jnp.tanh, x)
        return x


def fold_params(variables):
    from academicodec_tpu.utils.fold import fold_weight_norm

    return {"params": fold_weight_norm(variables["params"])}


def time_segment(name, module, x, results, folded_module=None, flop=None):
    key = jax.random.PRNGKey(0)
    # init on a short slice: params are length-independent and the full-shape
    # init compile would waste minutes on the relay
    variables = jax.jit(module.init)(key, x[:1, :640])
    f = jax.jit(lambda v, z: module.apply(v, z))
    t = bench(f, variables, x)
    results[f"{name}_ms"] = round(t * 1e3, 3)
    if flop:
        results[f"{name}_pct_peak"] = round(100 * flop / t / PEAK_BF16, 1)
    if folded_module is not None:
        fv = fold_params(variables)
        ff = jax.jit(lambda v, z: folded_module.apply(v, z))
        t2 = bench(ff, fv, x)
        results[f"{name}_folded_ms"] = round(t2 * 1e3, 3)
    print(json.dumps({k: v for k, v in results.items() if k.startswith(name)}),
          flush=True)
    return results


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    B, F = 8, 750
    key = jax.random.PRNGKey(1)
    results = {}

    # relay dispatch floor
    idop = jax.jit(lambda z: z + 1.0)
    zf = jnp.zeros((8, 8), jnp.bfloat16)
    results["dispatch_floor_ms"] = round(bench(idop, zf) * 1e3, 3)

    def rnd(shape):
        return (jax.random.normal(key, shape) * 0.1).astype(jnp.bfloat16)

    # conv_pre
    x = rnd((B, F, 512))
    flop = 2 * 7 * 512 * 512 * F * B
    time_segment(
        "conv_pre", PrePost(cin=512, cout=512), x, results,
        folded_module=PrePost(cin=512, cout=512, norm="none"), flop=flop,
    )

    stages = [
        (0, 512, 256, 16, 8, F, None),
        (1, 256, 128, 11, 5, F * 8, None),
        (2, 128, 64, 8, 4, F * 40, 4),
        (3, 64, 32, 4, 2, F * 160, 8),
    ]
    for si, cin, cout, k, u, tin, p in stages:
        x = rnd((B, tin, cin))
        tout = tin * u
        flop = 2 * (k / u) * cin * cout * tout * B
        time_segment(
            f"s{si}_convT", UpsSeg(cin=cin, cout=cout, k=k, u=u), x, results,
            folded_module=UpsSeg(cin=cin, cout=cout, k=k, u=u, norm="none"),
            flop=flop,
        )
        y = rnd((B, tout, cout))
        # 6 convs per resblock (3 dilated + 3 unit, all kernel rk) x 3
        # resblocks rk in {3,7,11}: sum_rk 6*rk*C^2 MACs per position
        flop_b = 2 * 6 * (3 + 7 + 11) * cout * cout * tout * B
        time_segment(
            f"s{si}_bundle", ResBundle(channels=cout), y, results,
            folded_module=ResBundle(channels=cout, norm="none"), flop=flop_b,
        )
        if p is not None:
            m = ResBundle(channels=cout)
            variables = jax.jit(m.init)(jax.random.PRNGKey(0), y[:1, :640])
            f = jax.jit(lambda v, z: packed_ops.unpack_t(m.apply(v, packed_ops.pack_t(z, p))))
            t = bench(f, variables, y)
            results[f"s{si}_bundle_packed_ms"] = round(t * 1e3, 3)
            results[f"s{si}_bundle_packed_pct_peak"] = round(
                100 * flop_b / t / PEAK_BF16, 1
            )
            mf = ResBundle(channels=cout, norm="none")
            fv = fold_params(variables)
            ff = jax.jit(lambda v, z: packed_ops.unpack_t(mf.apply(v, packed_ops.pack_t(z, p))))
            t2 = bench(ff, fv, y)
            results[f"s{si}_bundle_packed_folded_ms"] = round(t2 * 1e3, 3)
            print(json.dumps({k: v for k, v in results.items()
                              if k.startswith(f"s{si}_bundle_packed")}), flush=True)

    # conv_post
    x = rnd((B, F * 320, 32))
    flop = 2 * 7 * 32 * 1 * F * 320 * B
    time_segment(
        "conv_post", PrePost(cin=32, cout=1, tanh=True), x, results,
        folded_module=PrePost(cin=32, cout=1, tanh=True, norm="none"), flop=flop,
    )

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
