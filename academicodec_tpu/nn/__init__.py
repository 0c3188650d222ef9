from academicodec_tpu.nn.conv import (
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    SConv1d,
    SConvTranspose1d,
)
from academicodec_tpu.nn.lstm import SLSTM
from academicodec_tpu.nn.seanet import SEANetEncoder, SEANetDecoder, SEANetResnetBlock
