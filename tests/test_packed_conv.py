"""Packed (lanes-packed) conv algebra == plain ops, all codec shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from academicodec_tpu.ops.conv import conv1d, conv_transpose1d
from academicodec_tpu.ops.packed import (
    pack,
    packed_conv1d,
    packed_conv_transpose1d,
    unpack,
)


def _plain_conv(x, W, stride, pad_lo):
    # y[t] = sum_k x[t*stride + k - pad_lo] W[k]: left-pad then VALID conv
    # zero-extended conv: y[t] = sum_k x[t*stride + k - pad_lo] W[k], with x
    # treated as 0 outside [0, T) — the packed path's junk-tail convention
    xpad = jnp.pad(x, ((0, 0), (pad_lo, 4 * W.shape[0] + 64), (0, 0)))
    return conv1d(xpad, W, stride=stride)


@pytest.mark.parametrize(
    "K,s,Ci,Co,T,p,pad_lo",
    [
        (3, 1, 32, 16, 1000, 4, 1),     # decoder resblock conv3
        (1, 1, 16, 32, 1000, 4, 0),     # resblock conv1
        (7, 1, 32, 1, 999, 8, 3),       # final conv7
        (7, 1, 1, 32, 1003, 128, 3),    # encoder stem (C=1!)
        (4, 2, 32, 64, 1000, 8, 1),     # encoder downsample k=2s
        (8, 4, 64, 128, 997, 8, 2),     # deeper downsample
        (3, 1, 5, 3, 101, 25, 2),       # odd sizes
    ],
)
def test_packed_conv1d_matches_plain(K, s, Ci, Co, T, p, pad_lo):
    rng = jax.random.PRNGKey(K * 131 + s)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, T, Ci), jnp.float32)
    W = jax.random.normal(k2, (K, Ci, Co), jnp.float32) * 0.2
    b = jax.random.normal(k3, (Co,), jnp.float32)

    ref = _plain_conv(x, W, s, pad_lo) + b
    xp = pack(x, p)
    yp, p_out = packed_conv1d(xp, W, b, stride=s, p_in=p, pad_lo=pad_lo)
    assert p_out == p // s
    got = unpack(yp, p_out)
    L = min(ref.shape[1], got.shape[1])
    np.testing.assert_allclose(
        np.asarray(got[:, :L]), np.asarray(ref[:, :L]), atol=2e-4, rtol=1e-4
    )


@pytest.mark.parametrize(
    "K,s,Ci,Co,T,p,pad_lo,pad_hi",
    [
        (12, 6, 512, 256, 40, 1, 3, 3),   # decoder stage 0 (p_in=1)
        (10, 5, 256, 128, 60, 1, 2, 3),   # stage 1
        (8, 4, 128, 64, 100, 2, 2, 2),    # stage 2, packed input
        (4, 2, 64, 32, 200, 4, 1, 1),     # stage 3, packed input
        (16, 8, 6, 5, 30, 2, 4, 4),      # hifigan-like
        (11, 5, 7, 3, 33, 3, 3, 3),      # ragged K/s
    ],
)
def test_packed_conv_transpose1d_matches_plain(K, s, Ci, Co, T, p, pad_lo, pad_hi):
    rng = jax.random.PRNGKey(K * 37 + s)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, T, Ci), jnp.float32)
    W = jax.random.normal(k2, (K, Ci, Co), jnp.float32) * 0.2
    b = jax.random.normal(k3, (Co,), jnp.float32)

    ref = conv_transpose1d(x, W, b, stride=s, padding=(pad_lo, pad_hi))
    xp = pack(x, p)
    yp, p_out = packed_conv_transpose1d(xp, W, b, stride=s, p_in=p, pad_lo=pad_lo)
    assert p_out == p * s
    got = unpack(yp, p_out, length=ref.shape[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_packed_chain_decoder_tail():
    """A chained packed tail (convT -> resblock convs -> conv7) equals the
    plain pipeline with ONE pack at entry and ONE unpack at exit."""
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (2, 120, 64), jnp.float32) * 0.5
    Wt = jax.random.normal(ks[1], (4, 64, 32), jnp.float32) * 0.2
    W3 = jax.random.normal(ks[2], (3, 32, 16), jnp.float32) * 0.2
    W1 = jax.random.normal(ks[3], (1, 16, 32), jnp.float32) * 0.2
    W7 = jax.random.normal(ks[4], (7, 32, 1), jnp.float32) * 0.2
    elu = jax.nn.elu

    # plain
    y = conv_transpose1d(x, Wt, stride=2, padding=(1, 1))  # [2,240,32]
    h = conv1d(jnp.pad(elu(y), ((0, 0), (1, 1), (0, 0))), W3)
    h = conv1d(elu(h), W1)
    y = y + h
    ref = conv1d(jnp.pad(elu(y), ((0, 0), (3, 3), (0, 0))), W7)

    # packed: p 4 -> 8, no intermediate unpacking
    xp = pack(x, 4)
    yp, p = packed_conv_transpose1d(xp, Wt, stride=2, p_in=4, pad_lo=1)
    hp, _ = packed_conv1d(elu(yp), W3, p_in=p, pad_lo=1)
    hp, _ = packed_conv1d(elu(hp), W1, p_in=p, pad_lo=0)
    yp = yp + hp
    op, _ = packed_conv1d(elu(yp), W7, p_in=p, pad_lo=3)
    got = unpack(op, p, length=ref.shape[1])

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


from academicodec_tpu.ops import padding as pad_ops
from academicodec_tpu.ops.packed import (
    Packed,
    pack_t,
    sconv1d_packed,
    sconvtranspose1d_packed,
    unpack_t,
)


@pytest.mark.parametrize(
    "K,s,d,Ci,Co,T,p,pads,mode",
    [
        (3, 1, 1, 32, 16, 2400, 8, (1, 1), "reflect"),   # decoder resblock
        (7, 1, 1, 32, 1, 2400, 8, (3, 3), "reflect"),    # final conv7
        (3, 1, 2, 16, 16, 2400, 8, (2, 2), "reflect"),   # dilated resblock
        (4, 2, 1, 32, 64, 2400, 8, (1, 2), "reflect"),   # encoder downsample
        (8, 4, 1, 64, 128, 2400, 4, (3, 4), "reflect"),  # deeper downsample
        (7, 1, 1, 1, 32, 2400, 16, (6, 0), "zero"),      # causal stem, zero pad
        (7, 1, 1, 8, 8, 2400, 8, (6, 0), "reflect"),     # causal, reflect pad
        (3, 1, 1, 8, 8, 24, 8, (1, 1), "reflect"),       # tiny: fallback path
    ],
)
def test_sconv1d_packed_exact(K, s, d, Ci, Co, T, p, pads, mode):
    rng = jax.random.PRNGKey(K + s + d)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, T, Ci), jnp.float32)
    W = jax.random.normal(k2, (K, Ci, Co), jnp.float32) * 0.2
    b = jax.random.normal(k3, (Co,), jnp.float32)

    ref = conv1d(pad_ops.pad1d(x, pads, mode=mode), W, b, stride=s, dilation=d)
    got = unpack_t(
        sconv1d_packed(
            pack_t(x, p), W, b, stride=s, dilation=d,
            pad_left=pads[0], pad_right=pads[1], pad_mode=mode,
        )
    )
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "K,s,Ci,Co,T,p",
    [
        (4, 2, 64, 32, 1200, 4),
        (8, 4, 128, 64, 300, 1),
        (12, 6, 64, 32, 100, 2),
    ],
)
def test_sconvtranspose1d_packed_exact(K, s, Ci, Co, T, p):
    rng = jax.random.PRNGKey(K * 7 + s)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, T, Ci), jnp.float32)
    W = jax.random.normal(k2, (K, Ci, Co), jnp.float32) * 0.2
    b = jax.random.normal(k3, (Co,), jnp.float32)
    total = K - s
    pad_r = total // 2
    pad_l = total - pad_r

    y = conv_transpose1d(x, W, b, stride=s, padding=(0, 0))
    ref = pad_ops.unpad1d(y, (pad_l, pad_r))
    got = unpack_t(
        sconvtranspose1d_packed(
            pack_t(x, p), W, b, stride=s, pad_left=pad_l, pad_right=pad_r
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_packed_chain_with_junk_tail_slots():
    """convT leaves (k-s) junk slots in its last row; downstream packed convs
    must still be exact (tail correction keys off true length, not rows)."""
    rng = jax.random.PRNGKey(3)
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (2, 300, 64), jnp.float32) * 0.5
    Wt = jax.random.normal(ks[1], (4, 64, 32), jnp.float32) * 0.2
    W3 = jax.random.normal(ks[2], (3, 32, 16), jnp.float32) * 0.2
    b3 = jax.random.normal(ks[3], (16,), jnp.float32)

    y_ref = pad_ops.unpad1d(conv_transpose1d(x, Wt, stride=2, padding=(0, 0)), (1, 1))
    ref = conv1d(pad_ops.pad1d(y_ref, (1, 1), mode="reflect"), W3, b3)

    tp = sconvtranspose1d_packed(pack_t(x, 4), Wt, None, stride=2, pad_left=1, pad_right=1)
    assert tp.length == y_ref.shape[1]
    got = unpack_t(sconv1d_packed(tp, W3, b3, pad_left=1, pad_right=1, pad_mode="reflect"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_soundstream_packed_conv_model_parity():
    """packed_conv=True is a pure serving optimization: identical tokens,
    float-noise-level waveform deltas, same param tree."""
    from academicodec_tpu.models.soundstream import SoundStream

    kw = dict(n_filters=32, dimension=128, ratios=(6, 5, 4, 2),
              sample_rate=24000, target_bandwidths=(1, 2, 4), bins=64)
    m0 = SoundStream(**kw)
    m1 = SoundStream(packed_conv=True, **kw)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 4800)) * 0.1
    v = m0.init({"params": rng, "rvq": rng}, wav, n_q=m0.n_q, training=False)
    out0, _, codes0 = m0.apply(v, wav, n_q=m0.n_q, training=False)
    out1, _, codes1 = m1.apply(v, wav, n_q=m1.n_q, training=False)
    np.testing.assert_array_equal(np.asarray(codes0), np.asarray(codes1))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5, rtol=1e-5)

    # encode/decode methods too (the serving entry points)
    e0 = m0.apply(v, wav, target_bw=4, method=SoundStream.encode)
    e1 = m1.apply(v, wav, target_bw=4, method=SoundStream.encode)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    d0 = m0.apply(v, e0, method=SoundStream.decode)
    d1 = m1.apply(v, e0, method=SoundStream.decode)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("T", [2400, 2401, 2389])  # aligned + junk-slot tails
def test_deferred_halo_chain_exact(T):
    """Deferred-halo mode (pack_t(halo=...)): zero-extension main stream +
    strips spliced once at unpack equals the plain reflect pipeline through
    a strided conv -> convT -> dilated resblock-style chain."""
    rng = jax.random.PRNGKey(7)
    ks = jax.random.split(rng, 5)
    x = jax.random.normal(ks[0], (2, T, 16), jnp.float32) * 0.5
    Wd = jax.random.normal(ks[1], (4, 16, 32), jnp.float32) * 0.2
    Wt = jax.random.normal(ks[2], (4, 32, 16), jnp.float32) * 0.2
    W3 = jax.random.normal(ks[3], (3, 16, 16), jnp.float32) * 0.2
    W7 = jax.random.normal(ks[4], (7, 16, 1), jnp.float32) * 0.2
    elu = jax.nn.elu

    # plain reference
    y = conv1d(pad_ops.pad1d(x, (1, 2), mode="reflect"), Wd, stride=2)
    y = pad_ops.unpad1d(conv_transpose1d(elu(y), Wt, stride=2, padding=(0, 0)), (1, 1))
    h = conv1d(pad_ops.pad1d(elu(y), (2, 2), mode="reflect"), W3, dilation=2)
    y = y + h
    ref = conv1d(pad_ops.pad1d(elu(y), (3, 3), mode="reflect"), W7)

    t = pack_t(x, 8, halo=200)
    t = sconv1d_packed(t, Wd, None, stride=2, pad_left=1, pad_right=2)
    t = t.map(elu)
    t = sconvtranspose1d_packed(t, Wt, None, stride=2, pad_left=1, pad_right=1)
    h = sconv1d_packed(t.map(elu), W3, None, dilation=2, pad_left=2, pad_right=2)
    t = t + h
    t = sconv1d_packed(t.map(elu), W7, None, pad_left=3, pad_right=3)
    assert t.deferred and (t.hb or t.tb)  # the splice path is actually live
    got = unpack_t(t)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("halo", [0, 64])
def test_oversized_padding_capacity_guard(halo):
    """pad_left+pad_right > span overflows the packed rows' output capacity
    (out_T > R*p_out); the guard must route to the exact unpacked fallback
    in both immediate and deferred modes (ADVICE r2)."""
    rng = jax.random.PRNGKey(3)
    T, p, C = 512, 8, 8  # T % p == 0: no junk-slot slack to hide in
    x = jax.random.normal(rng, (2, T, C), jnp.float32) * 0.5
    W = jax.random.normal(rng, (3, C, C), jnp.float32) * 0.2
    pl = pr = 40  # span = 2, out_T = 512 + 80 - 2 = 590 > 512
    ref = conv1d(pad_ops.pad1d(x, (pl, pr), mode="reflect"), W)
    t = sconv1d_packed(
        pack_t(x, p, halo=halo), W, None, pad_left=pl, pad_right=pr
    )
    got = unpack_t(t)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_deferred_halo_tiny_input_remat():
    """Tiny inputs erode the strips below the corrupt region; the deferred
    ops must fall back to exact unpacked compute (remat path) seamlessly."""
    rng = jax.random.PRNGKey(9)
    x = jax.random.normal(rng, (1, 40, 8), jnp.float32)
    W7 = jax.random.normal(rng, (7, 8, 8), jnp.float32) * 0.2
    ref = x
    for _ in range(4):
        ref = conv1d(pad_ops.pad1d(ref, (3, 3), mode="reflect"), W7)
    t = pack_t(x, 8, halo=16)
    for _ in range(4):
        t = sconv1d_packed(t, W7, None, pad_left=3, pad_right=3)
    np.testing.assert_allclose(np.asarray(unpack_t(t)), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_deferred_halo_fuzz():
    """Seeded fuzz over conv geometry: deferred-halo packed == plain for
    random (K, stride, dilation, pads, mode, T) combinations — the guard on
    the corrupt-region/erosion bookkeeping in ops/packed.py."""
    rng = np.random.default_rng(42)
    for trial in range(24):
        K = int(rng.integers(1, 9))
        s = int(rng.choice([1, 1, 2, 4]))
        d = int(rng.choice([1, 1, 2, 3])) if s == 1 else 1
        span = (K - 1) * d
        p = int(rng.choice([2, 4, 8]))
        if p % s:
            p *= s
        C = int(rng.choice([4, 8]))
        T = int(rng.integers(200, 400)) * p + int(rng.integers(0, p))
        pl = int(rng.integers(0, span + 2))
        pr = int(rng.integers(0, span + 2))
        if T + pl + pr <= span:
            continue
        mode = str(rng.choice(["reflect", "zero"]))
        halo = int(rng.choice([16, 64, 200]))
        key = jax.random.PRNGKey(trial)
        x = jax.random.normal(key, (2, T, C), jnp.float32) * 0.5
        W = jax.random.normal(key, (K, C, C), jnp.float32) * 0.2
        b = jax.random.normal(key, (C,), jnp.float32)
        ref = conv1d(
            pad_ops.pad1d(x, (pl, pr), mode=mode), W, b, stride=s, dilation=d
        )
        out_T = (T + pl + pr - span - 1) // s + 1
        ref = ref[:, :out_T]
        t = pack_t(x, p, halo=halo)
        got = unpack_t(
            sconv1d_packed(
                t, W, b, stride=s, dilation=d, pad_left=pl, pad_right=pr,
                pad_mode=mode,
            )
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=2e-4,
            err_msg=f"trial {trial}: K={K} s={s} d={d} p={p} T={T} "
                    f"pads=({pl},{pr}) mode={mode} halo={halo}",
        )
