"""HiFi-Codec acoustic-token extraction + copy-synthesis CLI.

Covers both reference inference surfaces:
  * token extraction for VALL-E/SoundStorm pipelines — writes
    ``{fid: tokens [1, T, 4]}`` to an ``.npz`` (egs/HiFi-Codec-*/infer.ipynb;
    normalization convention: ``librosa.util.normalize(wav) * 0.95``)
  * copy-synthesis — reconstructed wavs
    (models/hificodec/vqvae_copy_syn.py)

Checkpoint: framework orbax dir or reference torch ``g_*`` file.
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys

import jax
import numpy as np

from academicodec_tpu.data.wavio import read_wav, write_wav
from academicodec_tpu.models.hificodec import VQVAE
from academicodec_tpu.nn.hifigan import HiFiCodecConfig


def get_args():
    p = argparse.ArgumentParser("extract_tokens")
    p.add_argument("--config", type=str, required=True, help="model config JSON")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--input", type=str, required=True, help="wav dir or filelist")
    p.add_argument("--outputdir", type=str, required=True)
    p.add_argument("--tokens_out", type=str, default=None, help=".npz path for tokens")
    p.add_argument("--tokens_ecdc", type=str, default=None,
                   help="directory: also write one entropy-codable "
                        "<fid>.ecdc token blob per file (raw 10-bit packing, "
                        "or LM entropy coding with --lm when that is "
                        "smaller; decode via "
                        "codec.compress.decompress_tokens -> [n_q, T] in "
                        "the [l0g0,l0g1,l1g0,l1g1] stream order)")
    p.add_argument("--lm", type=str, default=None,
                   help="GRVQ token-LM checkpoint dir (cli/train_lm.py "
                        "--family hificodec) for entropy-coded --tokens_ecdc "
                        "blobs; per-stream expansion guard falls back to raw "
                        "packing whenever the LM coding would be larger")
    p.add_argument("--sample_rate", type=int, default=24000)
    p.add_argument("--no_synth", action="store_true", help="tokens only")
    p.add_argument("--normalize", action="store_true",
                   help="peak-normalize *0.95 (infer.ipynb convention)")
    p.add_argument("--packed_conv", action="store_true",
                   help="lanes-packed waveform-rate convs (serving fast path)")
    p.add_argument("--fused_resblock", action="store_true",
                   help="fused Pallas resblock towers on the narrow stages "
                        "(TPU serving fast path; ops/pallas/resblock.py)")
    p.add_argument("--fold_weight_norm", action="store_true",
                   help="fold weight-norm params for serving "
                        "(reference remove_weight_norm, vqvae_copy_syn.py:33)")
    p.add_argument("--int8_min_channels", type=int, default=0,
                   help="W8A8 int8 serving for resblock stages with channels "
                        ">= this (0 = off; 128 targets the MXU compute-bound "
                        "wide stages). Calibrates activation scales on the "
                        "first input file. ops/int8.py; quality cost "
                        "measured in BENCHMARKS.md")
    p.add_argument("--bucket_seconds", type=float, default=None,
                   help="pad inputs to multiples of this many seconds so a "
                        "variable-length corpus compiles once per bucket "
                        "count instead of once per distinct wav length "
                        "(jit recompiles cost 30 s-5 min each on the TPU "
                        "relay). Tokens are EXACT: the encoder masks its "
                        "GroupNorm statistics to the valid prefix "
                        "(VQVAE.encode lengths=), so trimmed streams match "
                        "an exact-length encode bit-for-bit. Requires the "
                        "plain lowering (no --packed_conv/--fused_resblock)")
    p.add_argument("--batch_files", type=int, default=1,
                   help="corpus serving batch: encode (and synthesize) this "
                        "many files per device call (requires "
                        "--bucket_seconds). Tokens stay BIT-EXACT per item "
                        "(masked GroupNorm statistics are per-item); files "
                        "are grouped by bucket count and partial groups are "
                        "batch-padded so the corpus reuses one executable "
                        "per bucket count")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each serving batch over all devices "
                        "(jax.sharding.Mesh; params replicated). Requires "
                        "--batch_files as a multiple of the device count. "
                        "Tokens stay bit-exact (batch-pointwise graph, "
                        "per-item masked GroupNorm stats)")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="shard each file's TIME axis over all devices "
                        "(GSPMD conv halo exchanges; parallel/sequence.py) "
                        "— the multi-chip mode for FEW LONG files (e.g. "
                        "audiobook token extraction), where batch DP has "
                        "nothing to shard. Sequential path only (no "
                        "--batch_files); needs the plain lowering")
    args = p.parse_args()
    if args.lm and not args.tokens_ecdc:
        p.error("--lm entropy-codes --tokens_ecdc blobs: pass --tokens_ecdc")
    if args.data_parallel and args.batch_files < 2:
        p.error("--data_parallel needs --batch_files >= the device count")
    if args.sequence_parallel and (args.data_parallel or args.batch_files > 1):
        p.error("--sequence_parallel shards time, not batch: drop "
                "--batch_files/--data_parallel")
    if args.sequence_parallel and (args.packed_conv or args.fused_resblock):
        p.error("--sequence_parallel needs the plain lowering: drop "
                "--packed_conv/--fused_resblock (lanes-packing folds time "
                "into channels, defeating spatial partitioning)")
    if args.bucket_seconds and (args.packed_conv or args.fused_resblock):
        p.error("--bucket_seconds needs the plain lowering: drop "
                "--packed_conv/--fused_resblock (masked GroupNorm stats)")
    if args.batch_files > 1 and not args.bucket_seconds:
        p.error("--batch_files needs --bucket_seconds (uniform padded "
                "lengths per device batch)")
    return args


def load_variables(path: str, model: VQVAE):
    if os.path.isfile(path) and not os.path.isdir(path):
        import torch

        from academicodec_tpu.utils.torch_import import import_hificodec

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        return import_hificodec(ckpt, n_groups=model.config.n_code_groups)
    from academicodec_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(path)
    if "params" in state:
        return state
    return {"params": state["g_params"], **state["g_extra"]}


def run_batched(args, cfg, model, variables, files, bucket,
                encode_masked, decode, eval_frames, tokens_dict, mesh=None):
    """Batched corpus extraction: one device encode (and one decode) per
    group of ``batch_files`` same-bucket files. Tokens are BIT-EXACT per
    item — the masked GroupNorm statistics are per-item, so a padded batch
    equals per-item exact encodes (tests/test_bucketed.py
    test_masked_encode_batches_variable_lengths). The eager reference serves
    files one by one (vqvae_tester.py:16-37); batch 1 leaves a TPU chip at
    its dispatch floor."""
    from academicodec_tpu.cli.compress import pipelined_groups, prefetch_reads

    hop = int(np.prod(cfg.upsample_rates))
    bf = bucket // hop
    sr = args.sample_rate

    def shard(arr):
        """Data-parallel serving: batch dim over the mesh (no-op without
        one). Bit-exactness holds — the masked-GroupNorm encode is
        batch-pointwise, so GSPMD partitioning cannot mix items."""
        if mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * arr.ndim
        spec[0] = mesh.axis_names[0]
        return jax.device_put(arr, NamedSharding(mesh, P(*spec)))

    @functools.lru_cache(maxsize=None)
    def decode_len(n: int) -> int:
        return jax.eval_shape(
            lambda v, c: model.apply(v, c, method=VQVAE.decode),
            variables,
            jax.ShapeDtypeStruct((1, n, 4), np.int32),
        ).shape[-1]

    def submit(group):
        """Dispatch the group's encode WITHOUT fetching (async) so the next
        group's host->device transfer + encode overlap this group's
        host-side trim/decode/write (the transfer dominates on
        relay-attached chips — benchmarks/corpus_serving_probe.py)."""
        fids, wavs = zip(*group)
        Ts = [len(w) for w in wavs]
        Tpad = max(math.ceil(t / bucket) * bucket for t in Ts)
        rows = [np.pad(w, (0, Tpad - t)) for w, t in zip(wavs, Ts)]
        lens = list(Ts)
        while len(rows) < args.batch_files:  # batch-pad partial groups
            rows.append(np.zeros(Tpad, np.float32))
            lens.append(Tpad)
        return fids, Ts, encode_masked(
            variables, shard(np.stack(rows)), shard(np.array(lens, np.int32))
        )

    def complete(submitted):
        fids, Ts, codes_dev = submitted
        codes_b = np.asarray(codes_dev)
        items = []
        for i, (fid, T) in enumerate(zip(fids, Ts)):
            codes = codes_b[i : i + 1, : eval_frames(T), :]  # [1, n, 4]
            tokens_dict[fid] = codes
            items.append((fid, codes))
        if not args.no_synth:
            nmax = max(c.shape[1] for _, c in items)
            nb = math.ceil(nmax / bf) * bf
            rows_c = []
            for _, c in items:
                cc = c[0]
                if nb > cc.shape[0]:
                    cc = np.concatenate(
                        [cc, np.repeat(cc[-1:], nb - cc.shape[0], axis=0)], axis=0
                    )
                rows_c.append(cc)
            while len(rows_c) < args.batch_files:
                rows_c.append(rows_c[0])
            outs = np.asarray(decode(variables, shard(np.stack(rows_c))))
            for i, (fid, c) in enumerate(items):
                out = outs[i, : decode_len(c.shape[1])]
                write_wav(os.path.join(args.outputdir, fid + ".wav"), out, sr)
        for fid, c in items:
            print(f"{fid}: tokens {c.shape}")

    def tagged_reads():
        for path, wav in prefetch_reads(files, sr, depth=2 * args.batch_files):
            fid = os.path.splitext(os.path.basename(path))[0]
            if args.normalize:
                peak = np.abs(wav).max() or 1.0
                wav = wav / peak * 0.95
            yield fid, wav

    pipelined_groups(
        tagged_reads(), lambda wav: -(-len(wav) // bucket),
        args.batch_files, submit, complete,
    )


def write_tokens_ecdc(args, cfg, tokens_dict, lm=None, lm_variables=None):
    """One ECDC token blob per file: GRVQ streams [n_q, T] packed raw at
    ceil(log2(n_codes)) bits, or LM-entropy-coded when --lm makes the blob
    SMALLER (codec.compress.compress_tokens_guarded — never expands)."""
    import io

    from academicodec_tpu.codec.binary import read_ecdc_header
    from academicodec_tpu.codec.compress import compress_tokens_guarded

    bits = max(1, math.ceil(math.log2(cfg.n_codes)))
    os.makedirs(args.tokens_ecdc, exist_ok=True)
    total = lm_used = 0
    for fid, toks in tokens_dict.items():
        c = np.asarray(toks)[0].T.astype(np.int32)  # [n_q, T], [l0g0,l0g1,l1g0,l1g1]
        blob = compress_tokens_guarded(
            c,
            bits_per_codebook=bits,
            metadata=dict(model="hificodec", sr=int(args.sample_rate)),
            lm=lm,
            lm_variables=lm_variables,
        )
        with open(os.path.join(args.tokens_ecdc, fid + ".ecdc"), "wb") as fh:
            fh.write(blob)
        bpt = len(blob) * 8 / c.size
        total += 1
        # the emitted header's `lm` flag IS the guard's decision — bpt
        # comparisons misclassify marginal wins (header overhead)
        if lm is not None and read_ecdc_header(io.BytesIO(blob)).get("lm"):
            lm_used += 1
        print(f"{fid}: {len(blob)} bytes, {bpt:.2f} bits/token (raw {bits})")
    if lm is not None:
        print(f"tokens_ecdc: LM coding won on {lm_used}/{total} files "
              f"(raw fallback on the rest — expansion guard)")


def main():
    args = get_args()
    import json

    with open(args.config) as fh:
        cfg = HiFiCodecConfig.from_json(json.load(fh))
    model = VQVAE(
        config=cfg, packed_conv=args.packed_conv,
        fused_resblock=args.fused_resblock,
        int8_min_channels=args.int8_min_channels,
    )
    lm = lm_variables = None
    if args.lm:  # validate before the (slow) checkpoint load
        from academicodec_tpu.cli.train_lm import load_lm

        try:
            lm, lm_variables, lm_meta = load_lm(
                args.lm, expect_family="hificodec",
                expect_nq=2 * cfg.n_code_groups, expect_bins=cfg.n_codes,
            )
        except ValueError as e:
            sys.exit(f"--lm: {e}")

    variables = load_variables(args.model_path, model)
    if args.fold_weight_norm:
        from academicodec_tpu.utils.fold import fold_vqvae

        model, variables = fold_vqvae(model, variables)

    from academicodec_tpu.data.dataset import list_audio_files

    files = list_audio_files(args.input)
    if args.int8_min_channels:
        from academicodec_tpu.models.hificodec import calibrate_quant

        wav0, _ = read_wav(files[0], sr=args.sample_rate)
        if args.normalize:
            # calibrate on what the model will actually see: the serving
            # path peak-normalizes every input below, so un-normalized
            # calibration would mis-scale the static activation ranges
            # (clipping quiet-first corpora, wasting range on loud ones)
            peak = np.abs(wav0).max() or 1.0
            wav0 = wav0 / peak * 0.95
        variables = calibrate_quant(model, variables, wav0[None, :])

    encode = jax.jit(lambda v, w: model.apply(v, w, method=VQVAE.encode))
    encode_masked = jax.jit(
        lambda v, w, l: model.apply(v, w, lengths=l, method=VQVAE.encode)
    )
    decode = jax.jit(lambda v, c: model.apply(v, c, method=VQVAE.decode))

    @functools.lru_cache(maxsize=None)
    def eval_frames(T: int) -> int:
        """Exact-length token count without compiling (jax.eval_shape)."""
        w = jax.ShapeDtypeStruct((1, T), np.float32)
        return jax.eval_shape(
            lambda v, x: model.apply(v, x, method=VQVAE.encode), variables, w
        ).shape[1]

    bucket = None
    if args.bucket_seconds:
        hop = int(np.prod(cfg.upsample_rates))
        raw = max(1, int(round(args.bucket_seconds * args.sample_rate)))
        bucket = math.ceil(raw / hop) * hop
    os.makedirs(args.outputdir, exist_ok=True)
    tokens_dict = {}

    if args.batch_files > 1:
        mesh = None
        if args.data_parallel:
            from academicodec_tpu.parallel import make_mesh, replicate

            mesh = make_mesh()
            n_dev = mesh.devices.size
            if args.batch_files % n_dev:
                sys.exit(f"--batch_files {args.batch_files} must be a "
                         f"multiple of the device count ({n_dev}) for "
                         f"--data_parallel")
            variables = replicate(variables, mesh)
        run_batched(args, cfg, model, variables, files, bucket,
                    encode_masked, decode, eval_frames, tokens_dict,
                    mesh=mesh)
        if args.tokens_out:
            np.savez(args.tokens_out, **tokens_dict)
            print(f"wrote {len(tokens_dict)} token tensors to {args.tokens_out}")
        if args.tokens_ecdc:
            write_tokens_ecdc(args, cfg, tokens_dict, lm=lm, lm_variables=lm_variables)
        return

    mesh_sp = None
    if args.sequence_parallel:
        from academicodec_tpu.parallel import make_mesh, replicate

        mesh_sp = make_mesh()
        variables = replicate(variables, mesh_sp)

    def sp(arr):
        """Sequence-parallel serving: time axis (dim 1) over the mesh
        (no-op without one). The encoder GroupNorms reduce over the
        sharded axis, so latents match unsharded serving to float
        tolerance and tokens are exact-to-argmin, not guaranteed
        bit-exact (parallel/sequence.py; tests/test_sharded_serving.py
        observes bit-exact tokens at f32/HIGHEST)."""
        if mesh_sp is None:
            return arr
        from academicodec_tpu.parallel.sequence import shard_time

        return shard_time(arr, mesh_sp, time_dim=1)

    for path in files:
        fid = os.path.splitext(os.path.basename(path))[0]
        wav, sr = read_wav(path, sr=args.sample_rate)
        if args.normalize:
            peak = np.abs(wav).max() or 1.0
            wav = wav / peak * 0.95
        if bucket:
            T = len(wav)
            B = math.ceil(T / bucket) * bucket
            n_exact = eval_frames(T)
            codes = np.asarray(
                encode_masked(
                    variables,
                    sp(np.pad(wav, (0, B - T))[None, :]),
                    np.array([T], np.int32),
                )
            )
            codes = codes[:, :n_exact, :]
        else:
            codes = np.asarray(encode(variables, sp(wav[None, :])))
        tokens_dict[fid] = codes
        if not args.no_synth:
            if bucket:
                bf = bucket // int(np.prod(cfg.upsample_rates))
                n = codes.shape[1]
                nb = math.ceil(n / bf) * bf
                padded = (
                    np.concatenate(
                        [codes, np.repeat(codes[:, -1:, :], nb - n, axis=1)], axis=1
                    )
                    if nb > n
                    else codes
                )
                out_len = jax.eval_shape(
                    lambda v, c: model.apply(v, c, method=VQVAE.decode),
                    variables,
                    jax.ShapeDtypeStruct(codes.shape, codes.dtype),
                ).shape[-1]
                out = np.asarray(decode(variables, sp(padded)))[0, :out_len]
            else:
                out = np.asarray(decode(variables, sp(codes)))[0]
            write_wav(os.path.join(args.outputdir, fid + ".wav"), out, sr)
        print(f"{fid}: tokens {codes.shape}")
    if args.tokens_out:
        np.savez(args.tokens_out, **tokens_dict)
        print(f"wrote {len(tokens_dict)} token tensors to {args.tokens_out}")
    if args.tokens_ecdc:
        write_tokens_ecdc(args, cfg, tokens_dict, lm=lm, lm_variables=lm_variables)


if __name__ == "__main__":
    main()
