"""High-level convenience API: build presets and load checkpoints in one call.

The "switching user" entry point: everything a reference user did with
``SoundStream(...)` + torch.load + remove_weight_norm`` or
``VQVAE(config, ckpt)`` is one function here.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax.numpy as jnp

from academicodec_tpu.models import presets
from academicodec_tpu.models.soundstream import SoundStream


def load_codec(
    preset: str,
    checkpoint: Optional[str] = None,
    dtype: Any = jnp.float32,
    **overrides,
) -> Tuple[Any, Any]:
    """Build a preset model and load weights.

    ``checkpoint`` may be:
      * a reference PyTorch file (``.pth`` SoundStream state_dict — DDP
        prefixes handled — or a HiFi-Codec ``g_*`` dict),
      * an orbax checkpoint directory saved by this framework,
      * None — random init (parity testing / training from scratch).

    Returns ``(model, variables)`` ready for
    ``model.apply(variables, wav, method=type(model).encode)``.
    """
    model = presets.build(preset, dtype=dtype, **overrides)

    if checkpoint is None:
        import jax

        rng = jax.random.PRNGKey(0)
        if isinstance(model, SoundStream):
            wav = jnp.zeros((1, model.sample_rate), jnp.float32)
            variables = model.init(
                {"params": rng, "rvq": rng}, wav, n_q=model.n_q, training=False
            )
        else:
            wav = jnp.zeros((1, model.config.segment_size), jnp.float32)
            variables = model.init({"params": rng}, wav, training=False)
        return model, variables

    if os.path.isfile(checkpoint):
        import torch

        from academicodec_tpu.utils import torch_import as ti

        ckpt = torch.load(checkpoint, map_location="cpu", weights_only=True)
        if isinstance(model, SoundStream):
            variables = ti.import_soundstream(ckpt, n_q=model.n_q)
        else:
            variables = ti.import_hificodec(ckpt, n_groups=model.config.n_code_groups)
        return model, variables

    from academicodec_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(checkpoint)
    if "params" in state:
        return model, state
    return model, {"params": state["g_params"], **state["g_extra"]}
