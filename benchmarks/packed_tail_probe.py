"""Chained packed decoder tail vs plain ops.

Plain:  convT(64->32, k4 s2) -> resblock(32) -> ELU -> conv7(32->1), all NWC
        at T=240k (25% lane use).
Packed: subpixel convT emits [B,120k,2*32] (p=2 packed, no depth-to-space),
        one reshape to p=4 (128 lanes), resblock + conv7 as block-Toeplitz
        convs at [B,60k,128], final tiny unpack. More FLOPs, full lanes,
        zero per-op relayouts.

Timing-faithful (phase alignment of the odd convT pad is ignored; shapes
and arithmetic intensity are exact).

    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/packed_tail_probe.py
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
elu = jax.nn.elu


def conv(x, W, pad):
    return lax.conv_general_dilated(
        x, W, window_strides=(1,), padding=(pad,), dimension_numbers=DN_1D)


def pack_kernel(kernel, p):
    K, Ci, Co = kernel.shape
    M = (p + K - 2) // p + 1
    jg, kg = np.meshgrid(np.arange(p), np.arange(K), indexing="ij")
    t = (jg + kg).ravel()
    W2 = jnp.zeros((M, p, Ci, p, Co), kernel.dtype)
    W2 = W2.at[t // p, t % p, :, jg.ravel(), :].set(kernel[kg.ravel()])
    return W2.reshape(M, p * Ci, p * Co), M


def bench(fn, args, iters=20):
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
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (8, 120000, 64), DTYPE) * 0.1
    Wt = jax.random.normal(ks[1], (4, 64, 32), DTYPE) * 0.1   # convT k4 s2
    W3 = jax.random.normal(ks[2], (3, 32, 16), DTYPE) * 0.1   # resblock conv3
    W1 = jax.random.normal(ks[3], (1, 16, 32), DTYPE) * 0.1   # resblock conv1
    W7 = jax.random.normal(ks[4], (7, 32, 1), DTYPE) * 0.1    # final conv7

    @jax.jit
    def plain(x):
        y = conv_transpose1d(x, Wt, stride=2, padding=(1, 1))  # [8,240000,32]
        h = elu(y)
        h = conv(h, W3, (1, 1))
        h = elu(h)
        h = conv(h, W1, (0, 0))
        y = y + h
        y = elu(y)
        y = conv(y, W7, (3, 3))
        return jnp.sum(y)

    # packed kernels (built once, constants under jit)
    Wt_sp = jnp.transpose(
        jnp.flip(jnp.pad(Wt, ((0, 0), (0, 0), (0, 0))), 0).reshape(2, 2, 64, 32),
        (0, 2, 1, 3)).reshape(2, 64, 64)  # subpixel convT: [M=2, Ci=64, s*Co=64]
    W3p, M3 = pack_kernel(W3, 4)
    W1p, M1 = pack_kernel(W1, 4)
    W7p, M7 = pack_kernel(W7, 4)

    @jax.jit
    def packed(x):
        # subpixel convT -> [8, 120001, 64] = p2-packed 240k x 32
        y = conv(x, Wt_sp, (1, 0))[:, :120000]
        y = y.reshape(8, 60000, 128)  # repack p=4, one relayout
        h = elu(y)
        h = conv(h, W3p, (0, M3 - 1))[:, :60000]
        h = elu(h)
        h = conv(h, W1p, (0, M1 - 1))[:, :60000]
        y = y + h
        y = elu(y)
        y = conv(y, W7p, (0, M7 - 1))[:, :60000]  # [8,60000,4]
        return jnp.sum(y)

    tp = bench(plain, (x,))
    tk = bench(packed, (x,))
    print(f"plain tail:  {tp:.2f} ms")
    print(f"packed tail: {tk:.2f} ms   ({tp / tk:.2f}x)")


if __name__ == "__main__":
    main()
