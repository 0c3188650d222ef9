"""Packed small-channel conv: does time-into-lanes packing beat plain NWC?

The decoder tail runs convs at C=32/64 over T=120k-240k — 25-50% lane
utilization. Pack p=128/C time steps into the channel dim and express the
k-tap conv as a dense conv over packed rows with a block-Toeplitz kernel
[M, p*Ci, p*Co]: ~same arithmetic, full 128-lane rows, p x fewer rows.

    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/packed_conv_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from academicodec_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

from academicodec_tpu.ops.conv import DN_1D

DTYPE = jnp.bfloat16


def conv1d_plain(x, kernel, pad):
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=(pad,), dimension_numbers=DN_1D
    )


def pack_kernel(kernel, p, pad_lo):
    """W[K, Ci, Co] -> W2[M, p*Ci, p*Co] s.t. packed conv == plain conv.

    With x packed as xp[r, i*Ci+c] = x[r*p + i - pad_lo ...] (pad folded into
    packing), output yp[r, j*Co+o] = y[r*p + j] = sum_k x[r*p + j + k - pad_lo]
    W[k]. Tap x[r*p + i - ...] lives in packed row r + m, slot i, where
    r*p + j + k - pad_lo = (r+m)*p + i - pad_lo  =>  i = j + k - m*p.
    """
    K, Ci, Co = kernel.shape
    M = (p + K - 2) // p + 1  # rows covering max offset j+k = p-1+K-1
    jg, kg = np.meshgrid(np.arange(p), np.arange(K), indexing="ij")
    t = (jg + kg).ravel()
    m_idx, i_idx = t // p, t % p
    W2 = jnp.zeros((M, p, Ci, p, Co), kernel.dtype)
    W2 = W2.at[m_idx, i_idx, :, jg.ravel(), :].set(kernel[kg.ravel()])
    return W2.reshape(M, p * Ci, p * Co), M


def conv1d_packed(x, kernel, pad, p):
    """Same-result conv with time packed into lanes (stride 1)."""
    B, T, Ci = x.shape
    K, _, Co = kernel.shape
    pad_lo, pad_hi = pad
    xpad = jnp.pad(x, ((0, 0), (pad_lo, 0), (0, 0)))
    Tout = T + pad_lo + pad_hi - K + 1
    rows = -(-Tout // p)
    W2, M = pack_kernel(kernel, p, pad_lo)
    # packed row q covers x[q*p : q*p+p); output row r reads rows [r, r+M)
    need = (rows + M - 1) * p
    xpad = jnp.pad(xpad, ((0, 0), (0, need - xpad.shape[1]), (0, 0)))
    xp = xpad.reshape(B, -1, p * Ci)
    yp = lax.conv_general_dilated(
        xp, W2, window_strides=(1,), padding=((0, M - 1),),
        dimension_numbers=DN_1D,
    )[:, :rows]
    y = yp.reshape(B, rows * p, Co)[:, :Tout]
    return y


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
    cases = [
        ("final conv7 32->1 @240k", 7, 32, 1, 240000, (3, 3)),
        ("resblk conv3 32->16 @240k", 3, 32, 16, 240000, (1, 1)),
        ("resblk conv1 16->32 @240k", 1, 16, 32, 240000, (0, 0)),
        ("resblk conv3 64->32 @120k", 3, 64, 32, 120000, (1, 1)),
        ("resblk conv3 128->64 @30k", 3, 128, 64, 30000, (1, 1)),
    ]
    for name, K, Ci, Co, T, pad in cases:
        k1, k2 = jax.random.split(jax.random.fold_in(rng, K * Ci))
        x = jax.random.normal(k1, (8, T, Ci), DTYPE) * 0.1
        W = jax.random.normal(k2, (K, Ci, Co), DTYPE) * 0.1
        p = max(1, 128 // max(Ci, Co))
        f_plain = jax.jit(lambda x, W, pad=pad: jnp.sum(conv1d_plain(x, W, pad)))
        f_pack = jax.jit(lambda x, W, pad=pad, p=p: jnp.sum(conv1d_packed(x, W, pad, p)))
        # numeric agreement
        a = conv1d_plain(x, W, pad)
        b = conv1d_packed(x, W, pad, p)
        diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        tp = bench(f_plain, (x, W))
        tk = bench(f_pack, (x, W))
        print(f"{name}: plain {tp:.2f} ms, packed(p={p}) {tk:.2f} ms "
              f"({tp / tk:.2f}x)  maxdiff={diff:.3g}")


if __name__ == "__main__":
    main()
