from academicodec_tpu.train.state import GANTrainState, make_optimizer, set_learning_rate
from academicodec_tpu.train.encodec import EncodecTrainConfig, EncodecTrainer
from academicodec_tpu.train.hificodec import HiFiCodecTrainConfig, HiFiCodecTrainer
from academicodec_tpu.train.lm import LMTrainConfig, LMTrainer
