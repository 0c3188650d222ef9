from academicodec_tpu.ops.pallas.rvq import rvq_encode_fused
