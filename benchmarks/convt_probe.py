"""Micro-benchmark: decoder convT tower — lhs_dilation vs subpixel lowering.

Times the four Encodec_24k_240d decoder transposed convs (batch 8 x 10 s)
implemented (a) as lax.conv_general_dilated with lhs_dilation (the naive
convT lowering) and (b) as a dense stride-1 conv producing s*Cout channels
followed by depth-to-space (subpixel). Run on the TPU:

    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/convt_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from academicodec_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

from academicodec_tpu.ops.conv import DN_1D, conv_transpose1d

DTYPE = jnp.bfloat16
# (K, s, Cin, Cout, Tin) for ratios (6,5,4,2), batch 8 x 10 s @ 24 kHz
STAGES = [
    (12, 6, 512, 256, 1000),
    (10, 5, 256, 128, 6000),
    (8, 4, 128, 64, 30000),
    (4, 2, 64, 32, 120000),
]


def subpixel(x, kernel, stride, padding):
    K, Ci, Co = kernel.shape
    s = stride
    M = -(-K // s)
    Wp = jnp.zeros((M * s, Ci, Co), kernel.dtype).at[:K].set(kernel)
    W2 = jnp.transpose(Wp.reshape(M, s, Ci, Co), (0, 2, 1, 3)).reshape(M, Ci, s * Co)
    y = lax.conv_general_dilated(
        x, jnp.flip(W2, axis=0), window_strides=(1,),
        padding=((M - 1, M - 1),), dimension_numbers=DN_1D,
    )
    B, Q, _ = y.shape
    y = y.reshape(B, Q * s, Co)
    full = (x.shape[1] - 1) * s + K
    return y[:, padding[0]: full - padding[1], :]


def bench(fn, args, iters=20):
    """fn must return a SCALAR — fetching big arrays over the relay network
    costs ~1 s per 100 MB and swamps the kernel time."""
    r = fn(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend())
    rng = jax.random.PRNGKey(0)
    xs, ws, pads = [], [], []
    for (K, s, Ci, Co, T) in STAGES:
        k1, k2, rng = jax.random.split(rng, 3)
        xs.append(jax.random.normal(k1, (8, T, Ci), DTYPE) * 0.1)
        ws.append(jax.random.normal(k2, (K, Ci, Co), DTYPE) * 0.05)
        pt = K - s
        pads.append((pt // 2, pt - pt // 2))  # reference asymmetric split

    @jax.jit
    def tower_dilated(xs0, ws):
        x = xs0
        outs = []
        for i, (K, s, Ci, Co, T) in enumerate(STAGES):
            x = conv_transpose1d(
                xs0 if i == 0 else x, ws[i], stride=s, padding=pads[i]
            )
            outs.append(jnp.sum(x))  # keep all stages live
        return x, jnp.stack(outs)

    @jax.jit
    def tower_subpixel(xs0, ws):
        x = xs0
        outs = []
        for i, (K, s, Ci, Co, T) in enumerate(STAGES):
            x = subpixel(xs0 if i == 0 else x, ws[i], STAGES[i][1], pads[i])
            outs.append(jnp.sum(x))
        return x, jnp.stack(outs)

    # numeric agreement first
    a, _ = tower_dilated(xs[0], ws)
    b, _ = tower_subpixel(xs[0], ws)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"tower max |diff| (bf16): {diff:.4g}")

    null = jax.jit(lambda a: jnp.sum(a))
    print(f"dispatch overhead (tiny jit): {bench(null, (xs[0][:1, :8, :8],)):.3f} ms")

    t_d = bench(lambda x, w: jnp.sum(tower_dilated(x, w)[0]), (xs[0], ws))
    t_s = bench(lambda x, w: jnp.sum(tower_subpixel(x, w)[0]), (xs[0], ws))
    print(f"convT tower lhs_dilation: {t_d:.2f} ms")
    print(f"convT tower subpixel:     {t_s:.2f} ms   ({t_d / t_s:.2f}x)")

    # per-stage split
    for i, (K, s, Ci, Co, T) in enumerate(STAGES):
        f_d = jax.jit(lambda x, w, s=s, p=pads[i]: jnp.sum(conv_transpose1d(x, w, stride=s, padding=p)))
        f_s = jax.jit(lambda x, w, s=s, p=pads[i]: jnp.sum(subpixel(x, w, s, p)))
        td = bench(f_d, (xs[i], ws[i]))
        ts = bench(f_s, (xs[i], ws[i]))
        print(f"stage {i} K={K} s={s} {Ci}->{Co} T={T}: dilated {td:.2f} ms, "
              f"subpixel {ts:.2f} ms ({td / ts:.2f}x)")


if __name__ == "__main__":
    main()
