"""Export a framework checkpoint as a reference-format PyTorch checkpoint.

The inverse of the torch-import path: a model trained HERE loads into the
upstream AcademiCodec stack (and any consumer of its public checkpoints)
via plain ``load_state_dict`` — no conversion scripts on the torch side.

  * ``--family encodec``: writes a flat SoundStream ``state_dict`` ``.pth``
    (what reference test.py:172-178 loads; main_launch.py:439 ``best_*``).
  * ``--family hificodec``: writes a ``g_*``-style dict with
    ``generator``/``encoder``/``quantizer`` state dicts
    (reference vqvae.py:13-29 / hificodec train.py:303-313).

Usage:
    python -m academicodec_tpu.cli.export_torch \
        --family hificodec --ckpt /path/to/orbax_dir_or_step --out g_export.pth

The checkpoint may be a training-state checkpoint (the train CLIs' saved
``GANTrainState``) or any payload with ``g_params``/``g_extra`` entries
(e.g. benchmarks/train_validation.py --save_path output). Weight-norm
parametrizations export as ``weight_v``/``weight_g`` (the reference
constructs its modules with weight_norm before loading); folded trees
export plain ``weight`` keys.
"""

from __future__ import annotations

import argparse

from academicodec_tpu.utils.checkpoint import load_checkpoint
from academicodec_tpu.utils.torch_export import (
    export_hificodec,
    export_soundstream,
    save_checkpoint_pth,
)


def main():
    p = argparse.ArgumentParser("export_torch")
    p.add_argument("--family", choices=("encodec", "hificodec"), required=True)
    p.add_argument("--ckpt", type=str, required=True,
                   help="framework checkpoint (orbax dir/step with g_params)")
    p.add_argument("--out", type=str, required=True, help="output .pth path")
    args = p.parse_args()

    state = load_checkpoint(args.ckpt)
    if "g_params" not in state:
        raise SystemExit(
            f"checkpoint {args.ckpt} has no g_params (keys: {sorted(state)[:8]})"
        )
    variables = {"params": state["g_params"], **state.get("g_extra", {})}
    if args.family == "encodec":
        sd = export_soundstream(variables)
        n_keys = len(sd)
    else:
        sd = export_hificodec(variables)
        n_keys = sum(len(v) for v in sd.values())
    save_checkpoint_pth(args.out, sd)
    print(f"wrote {args.out}: {args.family} checkpoint, {n_keys} tensors")


if __name__ == "__main__":
    main()
