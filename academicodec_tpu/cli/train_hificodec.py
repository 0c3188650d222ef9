"""HiFi-Codec training CLI (reference: egs/HiFi-Codec-*/start.sh -> train.py).

Config comes from the same JSON schema as the reference
(egs/HiFi-Codec-24k-320d/config_24k_320d.json); unknown keys are ignored.

Example:
    python -m academicodec_tpu.cli.train_hificodec \
        --config egs/HiFi-Codec-24k-320d/config_24k_320d.json \
        --input_training_file train.lst --input_validation_file valid.lst \
        --checkpoint_path ckpts/hificodec_24k
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import jax
import numpy as np

from academicodec_tpu.data.dataset import WavCropDataset, batch_iterator
from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.parallel import make_mesh, replicate, shard_batch
from academicodec_tpu.train.hificodec import HiFiCodecTrainConfig, HiFiCodecTrainer
from academicodec_tpu.utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_meta,
    save_checkpoint,
    scan_checkpoint,
)
from academicodec_tpu.utils.logging import Logger


def get_args():
    p = argparse.ArgumentParser("train_hificodec")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--input_training_file", type=str, required=True)
    p.add_argument("--input_validation_file", type=str, required=True)
    p.add_argument("--checkpoint_path", type=str, default="checkpoints")
    p.add_argument("--training_epochs", type=int, default=2000)
    p.add_argument("--stdout_interval", type=int, default=5)
    p.add_argument("--checkpoint_interval", type=int, default=5000)
    p.add_argument("--validation_interval", type=int, default=5000)
    p.add_argument("--num_ckpt_keep", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=None, help="override config")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: sequential microbatches per "
                        "optimizer update (batch_size %% accum_steps == 0); "
                        "numerically identical to the monolithic step for "
                        "this family (tests/test_grad_accum.py)")
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16 forwards/backwards with f32 master weights, "
                        "optimizer state, spectral-norm u, and loss reductions")
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--native_loader", action="store_true",
                   help="C++ threaded crop loader (seeks to crops; no resampling; "
                        "incompatible with --fine_tuning's paired mels)")
    p.add_argument("--fine_tuning", action="store_true",
                   help="mel-aligned crops from precomputed mel .npy files "
                        "(reference meldataset.py:183-206)")
    p.add_argument("--input_mels_dir", type=str, default=None,
                   help="dir of <stem>.npy mels for --fine_tuning")
    return p.parse_args()


def main():
    args = get_args()
    if args.multihost:
        jax.distributed.initialize()

    with open(args.config) as fh:
        raw = json.load(fh)
    model_cfg = HiFiCodecConfig.from_json(raw)
    cfg = HiFiCodecTrainConfig(
        model=model_cfg,
        learning_rate=raw.get("learning_rate", 2e-4),
        adam_b1=raw.get("adam_b1", 0.5),
        adam_b2=raw.get("adam_b2", 0.9),
        lr_decay=raw.get("lr_decay", 0.98),
        accum_steps=args.accum_steps,
        mixed_precision=args.mixed_precision,
    )
    trainer = HiFiCodecTrainer(cfg)
    logger = Logger(args.checkpoint_path, args=vars(args))
    # copy config next to checkpoints for provenance (reference env.py:11-16)
    if jax.process_index() == 0:
        os.makedirs(args.checkpoint_path, exist_ok=True)
        dst = os.path.join(args.checkpoint_path, "config.json")
        if os.path.abspath(args.config) != os.path.abspath(dst):
            shutil.copyfile(args.config, dst)

    mesh = make_mesh()
    batch_size = args.batch_size or raw.get("batch_size", 16)
    # rank-aware data sharding (reference DistributedSampler,
    # hificodec/train.py:138-152): global batch split evenly over hosts.
    pidx, pcount = jax.process_index(), jax.process_count()
    if batch_size % pcount:
        raise SystemExit(f"batch_size {batch_size} not divisible by {pcount} hosts")
    local_bs = batch_size // pcount
    segment = model_cfg.segment_size
    if args.fine_tuning:
        if not args.input_mels_dir:
            raise SystemExit("--fine_tuning requires --input_mels_dir")
        from academicodec_tpu.data.dataset import MelNpyCropDataset

        if args.native_loader:
            logger.log_info(
                "--native_loader ignored: --fine_tuning needs paired precomputed "
                "mels, which only the Python pipeline yields"
            )
        train_ds = MelNpyCropDataset(
            args.input_training_file, segment, hop_size=model_cfg.hop_size,
            base_mels_path=args.input_mels_dir,
            sample_rate=model_cfg.sampling_rate, seed=raw.get("seed", 1234),
        )
    else:
        train_ds = WavCropDataset(
            args.input_training_file, segment, sample_rate=model_cfg.sampling_rate,
            seed=raw.get("seed", 1234),
        )
    valid_ds = WavCropDataset(
        args.input_validation_file, segment, sample_rate=model_cfg.sampling_rate
    )

    rng = jax.random.PRNGKey(raw.get("seed", 1234))
    example = np.zeros((batch_size, segment), np.float32)
    state = trainer.init_state(rng, example)
    start_epoch = 0
    latest = scan_checkpoint(args.checkpoint_path, "state")
    if latest:
        state = load_checkpoint(latest, template=state)
        # epoch from checkpoint metadata (robust to dataset/batch-size
        # changes); pre-meta checkpoints fall back to step arithmetic
        start_epoch = int(
            load_checkpoint_meta(latest).get(
                "epoch", int(state.step) // max(1, len(train_ds) // batch_size)
            )
        )
        logger.log_info(
            f"resumed from {latest} at step {int(state.step)}, epoch {start_epoch}"
        )
    state = replicate(state, mesh)

    for epoch in range(start_epoch, args.training_epochs):
        state = trainer.set_epoch_lr(state, epoch)
        t_epoch = time.time()
        if args.native_loader and not args.fine_tuning:
            from academicodec_tpu.data.native_loader import native_batch_iterator

            it = native_batch_iterator(
                train_ds.files, segment, local_bs,
                sample_rate=model_cfg.sampling_rate,
                seed=raw.get("seed", 1234), epochs=1, start_epoch=epoch,
                process_index=pidx, process_count=pcount,
            )
        else:
            it = batch_iterator(
                train_ds, local_bs, seed=raw.get("seed", 1234), epochs=1,
                start_epoch=epoch,
                process_index=pidx, process_count=pcount,
            )
        for batch in it:
            if isinstance(batch, tuple):
                # fine-tuning: (wav, precomputed mel) — the mel is for
                # plotting only, the loss recomputes mels on device (same
                # as the reference hot loop, train.py:219-240)
                batch, _batch_mel = batch
            t0 = time.time()
            state, metrics = trainer.train_step(state, shard_batch(batch, mesh))
            step = int(state.step)
            if step % args.stdout_interval == 0:
                logger.log_info(
                    "Steps : {:d}, Gen Loss Total : {:4.3f}, Loss Q : {:4.3f}, "
                    "Mel-Spec. Error : {:4.3f}, s/b : {:4.3f}".format(
                        step,
                        float(metrics["loss_gen_all"]),
                        float(metrics["loss_q"]),
                        float(metrics["mel_error"]),
                        time.time() - t0,
                    )
                )
            if step % args.checkpoint_interval == 0 and step != 0:
                save_checkpoint(
                    args.checkpoint_path, "state", step, jax.device_get(state),
                    num_ckpt_keep=args.num_ckpt_keep, meta={"epoch": epoch},
                )
            if step % args.validation_interval == 0 and step != 0:
                errs = []
                for vb in batch_iterator(
                    valid_ds, local_bs, shuffle=False, epochs=1,
                    process_index=pidx, process_count=pcount,
                ):
                    errs.append(float(trainer.eval_step(state, shard_batch(vb, mesh))["val_mel_error"]))
                if errs:
                    logger.log_info(f"validation/mel_spec_error {np.mean(errs):.4f}")
        logger.log_info(
            f"Time taken for epoch {epoch + 1} is {int(time.time() - t_epoch)} sec"
        )
    logger.close()


if __name__ == "__main__":
    main()
