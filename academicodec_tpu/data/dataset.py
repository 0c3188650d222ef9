"""Host-side audio data pipeline: filelists, random crops, mixtures, batching.

The reference feeds training from torch DataLoaders with CPU workers
(models/encodec/dataset.py, models/soundstream/dataset.py,
models/hificodec/meldataset.py). The TPU-native equivalent keeps the host
side thin: read + crop + batch to fixed-shape float32 numpy (all static
shapes — one compiled step), prefetch with a thread pool, and compute mels
ON DEVICE inside the loss (unlike the reference's CPU-worker mels —
meldataset.py:183-206 — which would starve a TPU).

Covered behaviors:
  * random fixed-length crop or zero-pad (dataset.py:23-32)
  * p=0.3 two-clip mixture augmentation (soundstream/dataset.py:27-48)
  * corrupt-file fallback to low-level noise (meldataset.py:143-149)
  * filelist OR directory-glob sources (egs/util/wavlstgen.py)
"""

from __future__ import annotations

import concurrent.futures as cf
import glob
import os
import random
from typing import Iterator, List, Optional

import numpy as np

from academicodec_tpu.data.wavio import read_wav


def list_audio_files(source: str) -> List[str]:
    """``source`` is a directory (globbed for ``*.wav``, recursively) or a
    filelist with one path per line."""
    if os.path.isdir(source):
        files = sorted(
            glob.glob(os.path.join(source, "*.wav"))
            + glob.glob(os.path.join(source, "**", "*.wav"), recursive=True)
        )
        return sorted(set(files))
    with open(source) as fh:
        return [line.strip() for line in fh if line.strip()]


class WavCropDataset:
    """Random fixed-length crops from a list of wav files."""

    def __init__(
        self,
        source: str,
        segment_length: int,
        sample_rate: Optional[int] = None,
        mixture_prob: float = 0.0,
        seed: int = 0,
    ):
        self.files = list_audio_files(source)
        if not self.files:
            raise ValueError(f"no audio files found in {source}")
        self.segment_length = segment_length
        self.sample_rate = sample_rate
        self.mixture_prob = mixture_prob
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.files)

    def _load_crop(self, path: str) -> np.ndarray:
        seg = self.segment_length
        try:
            wav, _sr = read_wav(path, sr=self.sample_rate)
        except Exception:
            # corrupt-file fallback (reference meldataset.py:143-149)
            return (np.random.default_rng(0).standard_normal(seg) * 0.05).astype(
                np.float32
            )
        if wav.shape[-1] > seg:
            # inclusive upper bound: the final valid offset must be reachable
            # (reference dataset.py:26 uses the full range)
            st = self.rng.randint(0, wav.shape[-1] - seg)
            return wav[st : st + seg]
        out = np.zeros(seg, np.float32)
        out[: wav.shape[-1]] = wav
        return out

    def sample(self, index: int) -> np.ndarray:
        x = self._load_crop(self.files[index % len(self.files)])
        if self.mixture_prob > 0 and self.rng.random() > (1.0 - self.mixture_prob):
            other = self.rng.randrange(len(self.files))
            x = x + self._load_crop(self.files[other])
        return x


class MelNpyCropDataset(WavCropDataset):
    """Fine-tuning mode (reference meldataset.py:183-206): per-file
    precomputed mel ``.npy`` (``base_mels_path/<stem>.npy``, shape
    ``[num_mels, frames]``), with the random crop aligned to mel frames.
    ``sample`` returns ``(wav [segment], mel [num_mels, frames_per_seg])``.

    As in the reference hot loop, the precomputed mel is NOT the loss
    target (that is always recomputed from audio on device) — it rides
    along for plotting/conditioning consumers.
    """

    def __init__(
        self,
        source: str,
        segment_length: int,
        hop_size: int,
        base_mels_path: str,
        sample_rate: Optional[int] = None,
        seed: int = 0,
    ):
        super().__init__(source, segment_length, sample_rate=sample_rate, seed=seed)
        self.hop_size = hop_size
        self.base_mels_path = base_mels_path
        self.frames_per_seg = -(-segment_length // hop_size)  # ceil

    def sample(self, index: int):
        path = self.files[index % len(self.files)]
        stem = os.path.splitext(os.path.basename(path))[0]
        mel = np.load(os.path.join(self.base_mels_path, stem + ".npy"))
        if mel.ndim == 3:  # tolerate a leading batch dim
            mel = mel[0]
        seg, hop, fps = self.segment_length, self.hop_size, self.frames_per_seg
        try:
            wav, _sr = read_wav(path, sr=self.sample_rate)
        except Exception:
            wav = (np.random.default_rng(0).standard_normal(seg) * 0.05).astype(
                np.float32
            )
        if wav.shape[-1] >= seg and mel.shape[-1] >= fps:
            # mel-frame-aligned crop (meldataset.py:195-201); full range,
            # not the reference's last-offset-unreachable randint
            mel_start = self.rng.randint(0, mel.shape[-1] - fps)
            mel = mel[:, mel_start : mel_start + fps]
            wav = wav[mel_start * hop : mel_start * hop + seg]
            out = np.zeros(seg, np.float32)
            out[: wav.shape[-1]] = wav  # guard ragged final hop
            return out, mel.astype(np.float32)
        # pad both to fixed shapes (meldataset.py:202-206)
        mel_out = np.zeros((mel.shape[0], fps), np.float32)
        mel_out[:, : min(fps, mel.shape[-1])] = mel[:, :fps]
        wav_out = np.zeros(seg, np.float32)
        wav_out[: min(seg, wav.shape[-1])] = wav[:seg]
        return wav_out, mel_out


def shard_indices(
    idx: np.ndarray, process_index: int, process_count: int
) -> np.ndarray:
    """Partition a (shuffled) index permutation into per-process slices.

    DistributedSampler semantics (reference main_launch.py:220-227,
    hificodec/train.py:138-152): pad by wrapping so every process draws the
    same count, then stride by rank — slices are disjoint (up to the <1-batch
    wrap pad) and jointly cover the epoch. All processes must be given the
    SAME permutation (same seed), else the partition is meaningless.
    """
    if process_count <= 1:
        return idx
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} not in [0, {process_count})")
    pad = (-len(idx)) % process_count
    if pad:
        idx = np.concatenate([idx, idx[:pad]])
    return idx[process_index::process_count]


def batch_iterator(
    dataset: WavCropDataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_last: bool = True,
    num_workers: int = 8,
    seed: int = 0,
    epochs: Optional[int] = None,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[np.ndarray]:
    """Yield ``[batch_size, segment_length]`` float32 batches with threaded
    prefetch. ``epochs=None`` streams forever (set_epoch-style reshuffling
    per pass, like the reference DistributedSampler).

    ``batch_size`` is the PER-PROCESS batch size. For multi-host training
    pass ``process_index=jax.process_index(), process_count=
    jax.process_count()`` and the SAME ``seed`` on every host: each host
    then draws a disjoint, deterministic slice of the per-epoch shuffle
    (reference DistributedSampler, main_launch.py:220-227) and
    ``parallel.shard_batch`` assembles the local shards into the global
    array.
    """
    order_rng = np.random.default_rng(seed)
    n = len(dataset)
    epoch = 0
    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        while epochs is None or epoch < epochs:
            idx = np.arange(n)
            if shuffle:
                order_rng.shuffle(idx)
            idx = shard_indices(idx, process_index, process_count)
            m = len(idx)
            limit = (m // batch_size) * batch_size if drop_last else m
            for start in range(0, limit, batch_size):
                chunk = idx[start : start + batch_size]
                batch = list(pool.map(dataset.sample, chunk.tolist()))
                if len(batch) < batch_size:
                    continue
                if isinstance(batch[0], tuple):
                    # paired datasets (e.g. MelNpyCropDataset): stack columns
                    yield tuple(
                        np.stack(col).astype(np.float32) for col in zip(*batch)
                    )
                else:
                    yield np.stack(batch).astype(np.float32)
            epoch += 1
