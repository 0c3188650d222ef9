"""Batch compress/decompress CLI (reference: models/encodec/test.py).

Round-trips every ``*.wav`` under ``--input`` through the codec and writes
reconstructions to ``--output``; with ``--ecdc`` also writes the compressed
``.ecdc`` bitstream per file.

Checkpoints: either a framework checkpoint (``--resume_path`` pointing at an
orbax dir) or a reference PyTorch ``.pth`` (auto-detected, imported through
utils.torch_import — including DDP ``module.`` prefix stripping,
test.py:172-178).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from academicodec_tpu.codec.compress import SoundStreamCompressor
from academicodec_tpu.data.wavio import read_wav, write_wav
from academicodec_tpu.models.soundstream import SoundStream


def get_args():
    p = argparse.ArgumentParser("compress")
    p.add_argument("--input", type=str, required=True, help="wav dir")
    p.add_argument("--output", type=str, required=True, help="output dir")
    p.add_argument("--resume_path", type=str, required=True, help="checkpoint")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--ratios", type=int, nargs="+", default=[8, 5, 4, 2])
    p.add_argument(
        "--target_bandwidths", type=float, nargs="+", default=[1, 1.5, 2, 4, 6, 12]
    )
    p.add_argument("--target_bw", type=float, default=12)
    p.add_argument("--n_filters", type=int, default=32)
    p.add_argument("--dimension", type=int, default=512)
    p.add_argument("--bins", type=int, default=1024)
    p.add_argument("-r", "--rescale", action="store_true")
    p.add_argument("--packed_conv", action="store_true",
                   help="lanes-packed waveform-rate convs (serving fast path; "
                        "identical tokens, float-noise wav deltas)")
    p.add_argument("--ecdc", action="store_true", help="also write .ecdc streams")
    p.add_argument("--lm", type=str, default=None,
                   help="token-LM checkpoint dir (cli/train_lm.py) for "
                        "entropy-coded streams instead of raw bit packing")
    p.add_argument("--bucket_seconds", type=float, default=None,
                   help="pad inputs to multiples of this many seconds so a "
                        "variable-length corpus compiles once per bucket "
                        "count instead of once per distinct wav length "
                        "(jit recompiles cost 30 s-5 min each on the TPU "
                        "relay). Head tokens stay bit-identical; the last "
                        "~receptive-field frames may differ from an exact-"
                        "length encode — leave off for reference-parity "
                        "bitstreams (codec/compress.py docstring)")
    p.add_argument("--dtype", choices=("f32", "bf16"), default="f32",
                   help="serving precision: f32 is the reference-parity "
                        "path; bf16 is the TPU serving fast path "
                        "(BENCHMARKS.md headline — tokens are argmin-"
                        "quantized and robust, wav deltas are float noise)")
    p.add_argument("--batch_files", type=int, default=1,
                   help="corpus serving batch: encode/decode this many files "
                        "per device call (requires --bucket_seconds). Files "
                        "are grouped by bucket count; partial groups are "
                        "batch-padded so the whole corpus reuses one "
                        "executable per bucket count. Output order follows "
                        "group completion, not the sorted listing")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each serving batch over all devices "
                        "(jax.sharding.Mesh; params replicated). The "
                        "multi-chip corpus deployment mode — requires "
                        "--batch_files to be a multiple of the device "
                        "count. Blobs stay byte-identical to single-device "
                        "serving (batch-pointwise graph, no collectives)")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="shard each file's TIME axis over all devices "
                        "(GSPMD conv halo exchanges; parallel/sequence.py) "
                        "— the multi-chip mode for FEW LONG files, where "
                        "batch DP has nothing to shard. Tokens and blobs "
                        "stay bit-exact (no cross-time reductions in "
                        "serving). Mutually exclusive with --data_parallel")
    args = p.parse_args()
    if args.sequence_parallel and args.data_parallel:
        p.error("--sequence_parallel and --data_parallel are mutually "
                "exclusive (shard time for few long files, batch for many "
                "short ones)")
    if args.sequence_parallel and args.packed_conv:
        p.error("--sequence_parallel needs the plain lowering: drop "
                "--packed_conv (lanes-packing folds time into channels, "
                "defeating spatial partitioning)")
    if args.data_parallel and args.batch_files < 2:
        p.error("--data_parallel needs --batch_files >= the device count "
                "(one batch row per device at minimum)")
    if args.batch_files > 1 and not args.bucket_seconds:
        p.error("--batch_files needs --bucket_seconds (uniform padded "
                "lengths per device batch)")
    return args


def check_clipping(wav: np.ndarray, rescale: bool) -> None:
    if rescale:
        return
    mx = np.abs(wav).max()
    if mx > 0.99:
        print(
            f"Clipping!! max scale {mx}, limit is 0.99. Use -r to rescale.",
            file=sys.stderr,
        )


def save_audio(wav: np.ndarray, path: str, sr: int, rescale: bool) -> None:
    limit = 0.99
    mx = np.abs(wav).max()
    if rescale:
        wav = wav * min(limit / max(mx, 1e-9), 1.0)
    else:
        wav = np.clip(wav, -limit, limit)
    write_wav(path, wav, sr)


def prefetch_reads(paths, sr: int, depth: int = 8):
    """Yield ``(path, wav)`` with up to ``depth`` file reads in flight on a
    worker thread — host IO overlaps device compute (JAX dispatch is async;
    the device queue drains while the next files decode on the host)."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    depth = max(1, depth)
    with ThreadPoolExecutor(max_workers=1) as pool:
        inflight: deque = deque()
        it = iter(paths)
        for path in it:
            inflight.append((path, pool.submit(read_wav, path, sr=sr)))
            if len(inflight) >= depth:
                break
        while inflight:
            path, fut = inflight.popleft()
            nxt = next(it, None)
            if nxt is not None:
                inflight.append((nxt, pool.submit(read_wav, nxt, sr=sr)))
            yield path, fut.result()[0]


def pipelined_groups(items, group_key, group_size, submit, complete):
    """Software-pipelined grouped serving (shared by cli/compress and
    cli/extract_tokens): collect ``(tag, wav)`` pairs into groups of
    ``group_size`` keyed by ``group_key(wav)`` (one padded device shape per
    group), dispatch each group with ``submit`` (async device work), and
    run the host half (``complete``) one group BEHIND — so group N's
    transfer + device compute overlap group N-1's host-side pack/decode/
    write. Trailing partial groups flush in insertion order."""
    pending: dict = {}
    inflight = None
    for tag, wav in items:
        key = group_key(wav)
        pending.setdefault(key, []).append((tag, wav))
        if len(pending[key]) >= group_size:
            submitted = submit(pending.pop(key))
            if inflight is not None:
                complete(inflight)
            inflight = submitted
    for group in pending.values():
        submitted = submit(group)
        if inflight is not None:
            complete(inflight)
        inflight = submitted
    if inflight is not None:
        complete(inflight)


def load_model_variables(path: str, model: SoundStream):
    if os.path.isfile(path) and path.endswith((".pth", ".pt")):
        import torch

        from academicodec_tpu.utils.torch_import import import_soundstream

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return import_soundstream(sd, n_q=model.n_q)
    from academicodec_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(path)
    if "params" in state:
        return state
    # full train state: pull the generator side
    return {"params": state["g_params"], **state["g_extra"]}


def main():
    args = get_args()
    import jax.numpy as jnp

    model = SoundStream(
        n_filters=args.n_filters,
        dimension=args.dimension,
        ratios=tuple(args.ratios),
        sample_rate=args.sr,
        target_bandwidths=tuple(args.target_bandwidths),
        bins=args.bins,
        packed_conv=args.packed_conv,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    variables = load_model_variables(args.resume_path, model)
    if args.dtype == "bf16":
        import jax

        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            variables,
        )
    lm = lm_vars = None
    lm_trained_frames = None
    if args.lm:
        from academicodec_tpu.cli.train_lm import load_lm

        try:
            lm, lm_vars, lm_meta = load_lm(
                args.lm, expect_family="encodec",
                expect_nq=model.n_q_for_bandwidth(args.target_bw),
                expect_bins=model.bins,
            )
        except ValueError as e:
            sys.exit(f"--lm: {e}")
        lm_trained_frames = lm_meta.get("trained_frames")
    mesh = None
    if args.data_parallel or args.sequence_parallel:
        from academicodec_tpu.parallel import make_mesh

        mesh = make_mesh()
        n_dev = mesh.devices.size
        if args.data_parallel and args.batch_files % n_dev:
            sys.exit(f"--batch_files {args.batch_files} must be a multiple "
                     f"of the device count ({n_dev}) for --data_parallel")
    compressor = SoundStreamCompressor(
        model, variables, target_bw=args.target_bw, lm=lm, lm_variables=lm_vars,
        bucket_seconds=args.bucket_seconds, mesh=mesh,
        shard_axis="time" if args.sequence_parallel else "batch",
    )

    os.makedirs(args.output, exist_ok=True)
    names = sorted(f for f in os.listdir(args.input) if f.endswith(".wav"))
    hop = int(np.prod(args.ratios))
    warned_lm_len = False

    def warn_lm(name: str, n_samples: int) -> None:
        nonlocal warned_lm_len
        frames = -(-n_samples // hop)
        if (lm_trained_frames and frames > lm_trained_frames
                and not warned_lm_len):
            warned_lm_len = True
            print(
                f"NOTE: {name} is {frames} frames but the LM was trained "
                f"on {lm_trained_frames}-frame crops; positions/context "
                "beyond the trained length are out of distribution and the "
                "LM-coded rate degrades. Files can NOT grow past raw "
                "packing (the per-stream guard falls back to raw,"
                " codec/compress.compress_tokens_guarded), but for the "
                "entropy-coding win retrain with --segment_seconds "
                "covering your files.",
                file=sys.stderr,
            )

    def complete(submitted):
        """Host half of a group: fetch tokens, pack, decode, write."""
        gnames, wavs, codes_dev = submitted
        blobs = compressor.pack_submitted(codes_dev, [len(w) for w in wavs])
        outs = compressor.decompress_batch(blobs, pad_to_batch=args.batch_files)
        for name, wav, blob, (out, sr) in zip(gnames, wavs, blobs, outs):
            if args.ecdc:
                with open(
                    os.path.join(args.output, name[:-4] + ".ecdc"), "wb"
                ) as fh:
                    fh.write(blob)
            check_clipping(out, args.rescale)
            save_audio(out, os.path.join(args.output, name), sr, args.rescale)
            print(f"{name}: {len(blob)} bytes "
                  f"({8 * len(blob) / (len(wav) / args.sr) / 1000:.2f} kbps)")

    def submit(group):
        gnames, wavs = zip(*group)
        return (
            gnames, wavs,
            compressor.submit_encode(list(wavs), pad_to_batch=args.batch_files),
        )

    def named_reads():
        for path, wav in prefetch_reads(
            [os.path.join(args.input, n) for n in names],
            args.sr,
            depth=2 * args.batch_files,
        ):
            name = os.path.basename(path)
            warn_lm(name, len(wav))
            yield name, wav

    # groups keyed by bucket count so every device batch has one padded
    # length; reads are prefetched on a worker thread (see pipelined_groups
    # for the one-group-ahead overlap)
    pipelined_groups(
        named_reads(),
        lambda wav: (
            -(-len(wav) // compressor.bucket) if compressor.bucket else len(wav)
        ),
        args.batch_files,
        submit,
        complete,
    )


if __name__ == "__main__":
    main()
