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

Determinism: every random decision (epoch shuffle, crop offset, mixture
draws) comes from ``std::mt19937_64``-compatible streams keyed on
``(seed, epoch, item)`` (``data/mt64.py``) — the same streams the C++
loader uses (native/wavloader.cpp:174-214) — so batches are independent of
thread schedule and bit-identical between the Python and native pipelines
for the same (seed, filelist, shard). The reference's DataLoader-worker
draws are schedule-dependent; this is the fix the native loader already
carried, now the default everywhere.
"""

from __future__ import annotations

import concurrent.futures as cf
import glob
import os
from typing import Iterator, List, Optional

import numpy as np

from academicodec_tpu.data.mt64 import MT19937_64, epoch_order, item_rng
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
        self.seed = seed

    def __len__(self) -> int:
        return len(self.files)

    def _load_crop(self, path: str, rng: MT19937_64) -> np.ndarray:
        seg = self.segment_length
        try:
            wav, _sr = read_wav(path, sr=self.sample_rate)
        except Exception:
            # corrupt-file fallback (reference meldataset.py:143-149).
            # NOTE: not bit-identical to the native loader's fallback (C++
            # std::normal_distribution); loader equivalence holds for clean
            # corpora.
            return (np.random.default_rng(0).standard_normal(seg) * 0.05).astype(
                np.float32
            )
        if wav.shape[-1] > seg:
            # inclusive upper bound: the final valid offset must be reachable
            # (reference dataset.py:26 uses the full range). Same draw as
            # wavloader.cpp:235.
            st = rng.next() % (wav.shape[-1] - seg + 1)
            return wav[st : st + seg]
        out = np.zeros(seg, np.float32)
        out[: wav.shape[-1]] = wav
        return out

    def sample(
        self, index: int, *, epoch: int = 0, item: Optional[int] = None
    ) -> np.ndarray:
        """Draw the crop for file ``index``. ``(epoch, item)`` key the RNG
        stream (``item`` = position within the epoch's sharded order,
        wavloader.cpp:201-214); standalone callers may omit them — the draw
        is then keyed on the file index alone."""
        if item is None:
            item = index
        rng = item_rng(self.seed, epoch, item)
        x = self._load_crop(self.files[index % len(self.files)], rng)
        if self.mixture_prob > 0:
            # compare at float32: the native loader receives mixture_prob as
            # a C float (wavloader.cpp:154, c_float in native_loader.py), so
            # its threshold is double(float(p)); a float64 threshold here
            # would disagree for draws in [float32(p), p) and desynchronize
            # every later draw — breaking the bit-identical loader contract
            # (tests/test_loader_equivalence.py)
            if rng.uniform53() < float(np.float32(self.mixture_prob)):
                other = rng.next() % len(self.files)
                x = x + self._load_crop(self.files[other], rng)
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

    def sample(self, index: int, *, epoch: int = 0, item: Optional[int] = None):
        if item is None:
            item = index
        rng = item_rng(self.seed, epoch, item)
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
            mel_start = rng.next() % (mel.shape[-1] - fps + 1)
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
    start_epoch: int = 0,
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

    Every random decision is keyed on ``(seed, epoch, item)`` with the
    native loader's mt19937_64 streams: batches are a pure function of the
    arguments (no thread-schedule dependence) and bit-identical to
    ``native_batch_iterator`` for the same inputs
    (tests/test_loader_equivalence.py) — provided ``seed == dataset.seed``
    (the native loader keys shuffle AND item streams on one seed).

    ``start_epoch`` offsets the epoch key of every stream: a resumed run
    passes the epoch it restarts at and reproduces the original run's
    order from there.
    """
    n = len(dataset)
    epoch = start_epoch
    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        while epochs is None or epoch < start_epoch + epochs:
            if shuffle:
                # the native loader's Fisher–Yates order (wavloader.cpp:174)
                idx = epoch_order(n, seed, epoch)
            else:
                idx = np.arange(n)
            idx = shard_indices(idx, process_index, process_count)
            m = len(idx)
            limit = (m // batch_size) * batch_size if drop_last else m
            e = epoch

            def draw(args, _e=e):
                item, file_idx = args
                return dataset.sample(file_idx, epoch=_e, item=item)

            for start in range(0, limit, batch_size):
                chunk = idx[start : start + batch_size]
                batch = list(
                    pool.map(draw, list(enumerate(chunk.tolist(), start=start)))
                )
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
