from academicodec_tpu.data.wavio import read_wav, write_wav
from academicodec_tpu.data.dataset import (
    WavCropDataset,
    batch_iterator,
    list_audio_files,
    shard_indices,
)
