from academicodec_tpu.ops.pallas.resblock import resblock_tower
from academicodec_tpu.ops.pallas.rvq import rvq_encode_fused
