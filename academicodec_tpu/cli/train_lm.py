"""Token-LM training CLI: the Encodec entropy-model stage.

The reference ships the LM machinery (StreamingTransformerEncoder,
transformer.py:67-141; arithmetic coder, quantization/ac.py) but never wires
a trainer for it. This CLI completes the two-stage pipeline: a frozen codec
checkpoint tokenizes wav crops on the fly, and ``RVQTokenLM`` is trained
teacher-forced on the token streams. The resulting checkpoint plugs into
``cli/compress.py --lm`` for entropy-coded ECDC files.

Example:
    python -m academicodec_tpu.cli.train_lm \
        --train_data_path /data/train --resume_path ckpts/encodec_16k/best_x \
        --sr 16000 --ratios 8 5 4 2 --target_bw 12 --steps 20000 \
        --path ckpts/lm_16k
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.data.dataset import WavCropDataset, batch_iterator
from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.train.lm import LMTrainConfig, LMTrainer
from academicodec_tpu.utils.checkpoint import save_checkpoint
from academicodec_tpu.utils.logging import Logger


def get_args():
    p = argparse.ArgumentParser("train_lm")
    p.add_argument("--train_data_path", type=str, required=True)
    p.add_argument("--resume_path", type=str, required=True, help="codec checkpoint")
    p.add_argument("--family", choices=("encodec", "hificodec"), default="encodec",
                   help="token source: 'encodec' models the SoundStream RVQ "
                        "streams at --target_bw; 'hificodec' models the GRVQ "
                        "4-stream tokens ([B,T,4] contract, reference "
                        "vqvae.py:43-45) — requires --hifi_config")
    p.add_argument("--hifi_config", type=str, default=None,
                   help="HiFi-Codec model config JSON (with --family hificodec)")
    # codec config (must match the checkpoint)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--ratios", type=int, nargs="+", default=[8, 5, 4, 2])
    p.add_argument(
        "--target_bandwidths", type=float, nargs="+", default=[1, 1.5, 2, 4, 6, 12]
    )
    p.add_argument("--n_filters", type=int, default=32)
    p.add_argument("--dimension", type=int, default=512)
    p.add_argument("--bins", type=int, default=1024)
    p.add_argument("--target_bw", type=float, default=12,
                   help="bandwidth whose token streams the LM models")
    # LM hyperparams (reference-paper scale: dim 200, 5 layers)
    p.add_argument("--lm_dim", type=int, default=200)
    p.add_argument("--lm_heads", type=int, default=8)
    p.add_argument("--lm_layers", type=int, default=5)
    p.add_argument("--past_context", type=int, default=1000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--cosine_decay", action="store_true",
                   help="warmup+cosine lr decay over --steps (constant lr "
                   "otherwise)")
    # schedule
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--segment_seconds", type=float, default=1.0,
                   help="training crop length. Bounds the stream length the "
                   "LM is in-distribution for at compression time: "
                   "cli/compress.py --lm streams longer than this see "
                   "positions/context never trained on and the coded rate "
                   "degrades (measured: a 1 s-crop LM codes 5 s streams at "
                   "11.0 bits/token vs 5.4 train). Train at least as long "
                   "as the files you will compress.")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--checkpoint_interval", type=int, default=1000)
    p.add_argument("--path", type=str, required=True, help="LM checkpoint dir")
    return p.parse_args()


def lm_config_dict(
    cfg: LMTrainConfig,
    trained_frames: int | None = None,
    family: str | None = None,
) -> dict:
    out = dict(
        n_q=cfg.n_q, bins=cfg.bins, dim=cfg.dim, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, past_context=cfg.past_context,
    )
    if family is not None:
        # not a model-constructor arg (load_lm pops it): which codec's token
        # streams this LM models — a GRVQ LM on RVQ streams (or vice versa)
        # would silently code at near-raw rates
        out["family"] = family
    if trained_frames is not None:
        # not a model-constructor arg (load_lm pops it): records the stream
        # length the LM is in-distribution for — positions/context beyond it
        # degrade the coded rate (measured: a 1 s-crop LM codes 5 s streams
        # at 11.0 bits/token vs 5.4 train, worse than 10-bit raw packing)
        out["trained_frames"] = int(trained_frames)
    return out


def main():
    args = get_args()
    if args.family == "hificodec":
        if not args.hifi_config:
            raise SystemExit("--family hificodec requires --hifi_config")
        from academicodec_tpu.cli.extract_tokens import load_variables
        from academicodec_tpu.models.hificodec import VQVAE
        from academicodec_tpu.nn.hifigan import HiFiCodecConfig

        with open(args.hifi_config) as fh:
            hcfg = HiFiCodecConfig.from_json(json.load(fh))
        codec = VQVAE(config=hcfg)
        codec_vars = load_variables(args.resume_path, codec)
        args.sr = hcfg.sampling_rate
        args.bins = hcfg.n_codes
        # VQVAE.encode yields [B, T', n_q] directly (the [B,T,4] contract)
        _enc = jax.jit(lambda v, w: codec.apply(v, w, method=VQVAE.encode))
        encode_bt = lambda v, w: _enc(v, w)
    else:
        from academicodec_tpu.cli.compress import load_model_variables

        codec = SoundStream(
            n_filters=args.n_filters,
            dimension=args.dimension,
            ratios=tuple(args.ratios),
            sample_rate=args.sr,
            target_bandwidths=tuple(args.target_bandwidths),
            bins=args.bins,
        )
        codec_vars = load_model_variables(args.resume_path, codec)
        _enc = jax.jit(
            lambda v, w: codec.apply(
                v, w, target_bw=args.target_bw, method=SoundStream.encode
            )
        )
        # SoundStream.encode yields [n_q, B, T'] -> [B, T', n_q]
        encode_bt = lambda v, w: jnp.transpose(_enc(v, w), (1, 2, 0))

    # n_q at this bandwidth (vq.py:88-96 formula, already baked into encode;
    # 2 groups x 2 residual layers = 4 for GRVQ) + frames per training
    # segment (recorded in lm_config.json so cli/compress.py --lm can warn
    # on out-of-distribution stream lengths)
    probe = np.zeros((1, int(args.segment_seconds * args.sr)), np.float32)
    probe_codes = np.asarray(encode_bt(codec_vars, probe))  # [1, T', n_q]
    n_q, trained_frames = int(probe_codes.shape[2]), int(probe_codes.shape[1])

    cfg = LMTrainConfig(
        n_q=n_q, bins=args.bins, dim=args.lm_dim, num_heads=args.lm_heads,
        num_layers=args.lm_layers, past_context=args.past_context, lr=args.lr,
        decay_steps=args.steps if args.cosine_decay else None,
    )
    trainer = LMTrainer(cfg)
    logger = Logger(args.path, args=vars(args))
    os.makedirs(args.path, exist_ok=True)
    with open(os.path.join(args.path, "lm_config.json"), "w") as fh:
        json.dump(
            lm_config_dict(cfg, trained_frames=trained_frames, family=args.family),
            fh,
        )

    segment = int(args.segment_seconds * args.sr)
    ds = WavCropDataset(args.train_data_path, segment, sample_rate=args.sr, seed=args.seed)
    it = batch_iterator(ds, args.batch_size, seed=args.seed,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    rng = jax.random.PRNGKey(args.seed)
    state = None
    for step_i, batch in enumerate(it):
        if step_i >= args.steps:
            break
        codes = np.asarray(encode_bt(codec_vars, batch)).astype(np.int32)  # [B, T', n_q]
        if state is None:
            state = trainer.init_state(rng, codes)
        state, metrics = trainer.train_step(state, codes)
        if step_i % args.print_freq == 0:
            logger.log_info(
                f"step {int(state.step)} ce={float(metrics['ce_loss']):.4f} "
                f"bits/token={float(metrics['bits_per_token']):.3f} "
                f"(raw {np.log2(args.bins):.0f})"
            )
        if int(state.step) % args.checkpoint_interval == 0:
            save_checkpoint(args.path, "lm", int(state.step),
                            jax.device_get({"params": state.params}))
    save_checkpoint(args.path, "lm", int(state.step),
                    jax.device_get({"params": state.params}))
    logger.log_info(f"done at step {int(state.step)}")
    logger.close()


def load_lm(path: str, expect_family: str | None = None,
            expect_nq: int | None = None, expect_bins: int | None = None):
    """Rebuild ``(lm, variables, meta)`` from a ``train_lm`` checkpoint
    directory (or a direct ``lm_<step>`` path inside one). ``meta`` carries
    the non-constructor keys of lm_config.json (e.g. ``trained_frames``);
    absent keys are simply missing from the dict (older checkpoints).

    ``expect_family``/``expect_nq``/``expect_bins`` validate the checkpoint
    against the codec it is about to code for — shared by every ``--lm``
    CLI so a GRVQ-trained LM can't silently code RVQ streams (or crash with
    an opaque flax shape error mid-file). A checkpoint with no recorded
    family (older) passes the family check."""
    from academicodec_tpu.models.lm import RVQTokenLM
    from academicodec_tpu.utils.checkpoint import load_checkpoint, scan_checkpoint

    directory = path
    ckpt = path
    if os.path.basename(path).startswith("lm_") and os.path.isdir(path):
        directory = os.path.dirname(path)
    else:
        ckpt = scan_checkpoint(path, "lm")
        if ckpt is None:
            raise FileNotFoundError(f"no lm_* checkpoint under {path}")
    with open(os.path.join(directory, "lm_config.json")) as fh:
        cfg = json.load(fh)
    meta = {k: cfg.pop(k) for k in ("trained_frames", "family") if k in cfg}
    lm = RVQTokenLM(**cfg)
    if expect_family is not None:
        fam = meta.get("family")
        if fam not in (None, expect_family):
            raise ValueError(
                f"LM checkpoint at {path} models '{fam}' token streams, not "
                f"'{expect_family}' (train with cli/train_lm.py "
                f"--family {expect_family})"
            )
    if (expect_nq is not None and lm.n_q != expect_nq) or (
        expect_bins is not None and lm.bins != expect_bins
    ):
        raise ValueError(
            f"LM shape mismatch: LM (n_q={lm.n_q}, bins={lm.bins}) vs codec "
            f"(n_q={expect_nq}, bins={expect_bins})"
        )
    variables = load_checkpoint(ckpt)
    return lm, variables, meta


if __name__ == "__main__":
    main()
