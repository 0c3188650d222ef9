from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.models.hificodec import VQVAE
