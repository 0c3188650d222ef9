from academicodec_tpu.ops.padding import (
    get_extra_padding_for_conv1d,
    pad_for_conv1d,
    pad1d,
    unpad1d,
)
from academicodec_tpu.ops.conv import conv1d, conv_transpose1d, conv2d
