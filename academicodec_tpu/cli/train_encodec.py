"""Encodec/SoundStream training CLI.

TPU-native replacement for the reference launch path
(egs/Encodec_*/start.sh -> torch.distributed.launch -> main_launch.py):
no process-per-GPU launcher — one process per host, a data mesh over all
chips, `jax.distributed.initialize` for multi-host.

Example (Encodec_16k_320d recipe):
    python -m academicodec_tpu.cli.train_encodec \
        --train_data_path /data/train --valid_data_path /data/valid \
        --sr 16000 --ratios 8 5 4 2 --target_bandwidths 1 1.5 2 4 6 12 \
        --batch_size 64 --path ckpts/encodec_16k

SoundStream recipe flavor: add --soundstream (mel scales 6..10 + sim loss
+ p=0.3 mixture augmentation, egs/SoundStream_24k_240d).
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from academicodec_tpu.data.dataset import WavCropDataset, batch_iterator
from academicodec_tpu.parallel import make_mesh, replicate, shard_batch
from academicodec_tpu.train.encodec import EncodecTrainConfig, EncodecTrainer
from academicodec_tpu.utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_meta,
    save_checkpoint,
    scan_checkpoint,
)
from academicodec_tpu.utils.logging import Logger
from academicodec_tpu.utils.profiling import StepTimer, param_count


def get_args():
    p = argparse.ArgumentParser("train_encodec")
    p.add_argument("--seed", type=int, default=6666)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--ratios", type=int, nargs="+", default=[8, 5, 4, 2])
    p.add_argument(
        "--target_bandwidths", type=float, nargs="+", default=[1, 1.5, 2, 4, 6, 12]
    )
    p.add_argument("--train_data_path", type=str, required=True)
    p.add_argument("--valid_data_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=80, help="global batch size")
    p.add_argument("--n_epochs", type=int, default=300)
    p.add_argument("--segment_seconds", type=float, default=1.0)
    p.add_argument("--lambda_wav", type=float, default=100.0)
    p.add_argument("--lambda_adv", type=float, default=1.0)
    p.add_argument("--lambda_feat", type=float, default=1.0)
    p.add_argument("--lambda_rec", type=float, default=1.0)
    p.add_argument("--lambda_com", type=float, default=1000.0)
    p.add_argument("--discriminator_iter_start", type=int, default=500)
    p.add_argument("--lr", type=float, default=3e-4)
    # debug-scale model/discriminator knobs (reference debug mode:
    # HiFi-Codec-24k-320d/start.sh:13-27 runs 1-GPU tiny-interval smoke)
    p.add_argument("--n_filters", type=int, default=32)
    p.add_argument("--dimension", type=int, default=512)
    p.add_argument("--bins", type=int, default=1024)
    p.add_argument("--debug_tiny_discs", action="store_true",
                   help="shrink discriminators for smoke tests")
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--checkpoint_interval", type=int, default=5000)
    p.add_argument("--path", type=str, default="model_path")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--soundstream", action="store_true", help="SoundStream recipe flavor")
    p.add_argument("--packed_conv", action="store_true",
                   help="lanes-packed generator convs in the train step "
                        "(exact; measured ~1.06x on-chip — see BENCHMARKS.md)")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: sequential microbatches per "
                        "optimizer update (batch_size %% accum_steps == 0); "
                        "reproduces the reference's 8-GPU effective batch on "
                        "fewer chips at ~batch/accum_steps activation memory")
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16 forwards/backwards with f32 master weights, "
                        "optimizer state, EMA codebooks, and loss reductions")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--multihost", action="store_true", help="jax.distributed.initialize")
    p.add_argument("--native_loader", action="store_true",
                   help="C++ threaded crop loader (seeks to crops; no resampling)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of steps 10-20 here")
    return p.parse_args()


def main():
    args = get_args()
    if args.multihost:
        jax.distributed.initialize()

    flavor = dict(
        mel_scale_powers=tuple(range(6, 11)) if args.soundstream else tuple(range(6, 12)),
        feat_include_sim=bool(args.soundstream),
    )
    tiny = (
        dict(stft_filters=8, stft_n_ffts=(256,), mpd_periods=(2, 3), msd_scales=1,
             mel_scale_powers=(6, 7))
        if args.debug_tiny_discs
        else {}
    )
    if args.debug_tiny_discs:
        flavor.pop("mel_scale_powers", None)
    cfg = EncodecTrainConfig(
        sr=args.sr,
        ratios=tuple(args.ratios),
        target_bandwidths=tuple(args.target_bandwidths),
        n_filters=args.n_filters,
        dimension=args.dimension,
        bins=args.bins,
        lambda_wav=args.lambda_wav,
        lambda_adv=args.lambda_adv,
        lambda_feat=args.lambda_feat,
        lambda_rec=args.lambda_rec,
        lambda_com=args.lambda_com,
        discriminator_iter_start=args.discriminator_iter_start,
        packed_conv=args.packed_conv,
        accum_steps=args.accum_steps,
        mixed_precision=args.mixed_precision,
        lr=args.lr,
        **flavor,
        **tiny,
    )
    trainer = EncodecTrainer(cfg)
    logger = Logger(args.path, tensorboard=args.tensorboard, args=vars(args))
    mesh = make_mesh()
    logger.log_info(f"devices: {jax.devices()}")

    # rank-aware data sharding (reference DistributedSampler,
    # main_launch.py:220-227): each host loads a disjoint slice; batch_size
    # stays the GLOBAL batch, split evenly over hosts.
    pidx, pcount = jax.process_index(), jax.process_count()
    if args.batch_size % pcount:
        raise SystemExit(f"--batch_size {args.batch_size} not divisible by {pcount} hosts")
    local_bs = args.batch_size // pcount

    segment = int(args.segment_seconds * args.sr)
    train_ds = WavCropDataset(
        args.train_data_path, segment, sample_rate=args.sr,
        mixture_prob=0.3 if args.soundstream else 0.0, seed=args.seed,
    )
    valid_ds = WavCropDataset(args.valid_data_path, segment, sample_rate=args.sr)

    rng = jax.random.PRNGKey(args.seed)
    example = np.zeros((args.batch_size, segment), np.float32)
    state = trainer.init_state(rng, example)
    start_epoch = 0
    if args.resume:
        latest = scan_checkpoint(args.path, "latest")
        if latest:
            state = load_checkpoint(latest, template=state)
            # epoch comes from the checkpoint metadata, not step arithmetic
            # (which breaks when dataset or batch size changed between runs);
            # pre-meta checkpoints fall back to the old derivation
            meta = load_checkpoint_meta(latest)
            start_epoch = int(
                meta.get(
                    "epoch",
                    int(state.step) // max(1, len(train_ds) // args.batch_size),
                )
            )
            logger.log_info(
                f"resumed from {latest} at step {int(state.step)}, "
                f"epoch {start_epoch}"
            )
    state = replicate(state, mesh)
    logger.log_info(
        f"generator params: {param_count(state.g_params):,}; "
        f"discriminator params: {param_count(state.d_params):,}"
    )

    best_valid = float("inf")
    timer = StepTimer()
    for epoch in range(start_epoch, args.n_epochs + 1):
        state = trainer.set_epoch_lr(state, epoch)
        # one seed + start_epoch keying: both loader backends reproduce this
        # epoch's exact order on resume (and match each other bit for bit)
        if args.native_loader:
            from academicodec_tpu.data.native_loader import native_batch_iterator

            it = native_batch_iterator(
                train_ds.files, segment, local_bs,
                sample_rate=args.sr, mixture_prob=train_ds.mixture_prob,
                seed=args.seed, epochs=1, start_epoch=epoch,
                process_index=pidx, process_count=pcount,
            )
        else:
            it = batch_iterator(
                train_ds, local_bs, seed=args.seed, epochs=1, start_epoch=epoch,
                process_index=pidx, process_count=pcount,
            )
        t_epoch = time.time()
        for i, batch in enumerate(it):
            profiling = args.profile_dir and epoch == start_epoch and i == 10
            if profiling:
                jax.profiler.start_trace(args.profile_dir)
            state, metrics = trainer.train_step(state, shard_batch(batch, mesh))
            if i % args.print_freq == 0:
                m = {k: float(v) for k, v in metrics.items()}
                sps = timer.tick()
                rate = f" s/b={sps:.3f}" if sps else ""
                logger.log_info(
                    f"epoch {epoch} step {int(state.step)} "
                    + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                    + rate
                )
                for k, v in m.items():
                    logger.add_scalar(f"train/{k}", v, int(state.step))
            if args.profile_dir and epoch == start_epoch and i == 20:
                jax.profiler.stop_trace()
            if int(state.step) % args.checkpoint_interval == 0:
                save_checkpoint(args.path, "latest", int(state.step),
                                jax.device_get(state), meta={"epoch": epoch})
        # validation sweep (reference main_launch.py:365-429)
        vals = []
        for batch in batch_iterator(
            valid_ds, local_bs, shuffle=False, epochs=1,
            process_index=pidx, process_count=pcount,
        ):
            vals.append(trainer.eval_step(state, shard_batch(batch, mesh)))
        if vals:
            mean = {k: float(np.mean([float(v[k]) for v in vals])) for k in vals[0]}
            logger.log_info(f"epoch {epoch} valid " + " ".join(f"{k}={v:.4f}" for k, v in mean.items()))
            for k, v in mean.items():
                logger.add_scalar(f"valid/{k}", v, int(state.step))
            # best-checkpoint tracking (reference main_launch.py:430-443)
            if mean["valid_loss_g"] < best_valid:
                best_valid = mean["valid_loss_g"]
                save_checkpoint(args.path, "best", int(state.step),
                                jax.device_get(state), meta={"epoch": epoch + 1})
                logger.log_info(f"new best valid_loss_g={best_valid:.4f}")
        # end-of-epoch: resume continues at the NEXT epoch
        save_checkpoint(args.path, "latest", int(state.step),
                        jax.device_get(state), meta={"epoch": epoch + 1})
        logger.log_info(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s")
    logger.close()


if __name__ == "__main__":
    main()
