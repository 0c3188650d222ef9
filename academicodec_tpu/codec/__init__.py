from academicodec_tpu.codec.binary import (
    BitPacker,
    BitUnpacker,
    write_ecdc_header,
    read_ecdc_header,
)
from academicodec_tpu.codec.ac import (
    ArithmeticCoder,
    ArithmeticDecoder,
    build_stable_quantized_cdf,
)
