"""AcademiCodec-TPU: a TPU-native (JAX/XLA/Pallas) neural audio codec framework.

A from-scratch rebuild of the capabilities of AcademiCodec (neural audio
codecs: Encodec, SoundStream, HiFi-Codec) designed TPU-first:

- channels-last ``[B, T, C]`` layouts everywhere (MXU/VPU friendly),
- functional quantizer state (EMA codebooks as explicit pytrees),
- ``lax.scan`` recurrences (LSTM, residual VQ) instead of Python loops,
- data-parallel training via ``jax.sharding.Mesh`` + XLA collectives,
- Pallas kernels for the codebook-search hot path.

Reference capability map: /root/reference (jacquelm/AcademiCodec).
"""

__version__ = "0.1.0"

from academicodec_tpu.api import load_codec  # noqa: E402,F401
from academicodec_tpu.models import presets  # noqa: E402,F401
