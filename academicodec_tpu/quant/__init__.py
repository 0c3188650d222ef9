from academicodec_tpu.quant.core_vq import ResidualVQ
from academicodec_tpu.quant.vq import ResidualVectorQuantizer, QuantizedResult
from academicodec_tpu.quant.grvq import GroupResidualVQ
