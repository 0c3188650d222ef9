"""Export this framework's pytrees as PyTorch AcademiCodec checkpoints.

The exact inverse of :mod:`academicodec_tpu.utils.torch_import`: models
trained here load into the reference stack (and into any downstream
consumer of the public HF checkpoints) without conversion scripts.

Emitted formats (matching what the reference trainers save):

  * Encodec/SoundStream — a flat ``state_dict`` of the reference
    ``SoundStream`` module (``best_*.pth`` / the ``'soundstream'`` entry of
    ``latest.pth``, main_launch.py:431-451): ``encoder.model.N...``,
    ``decoder.model.N...``, ``quantizer.vq.layers.N._codebook.*``.
  * HiFi-Codec ``g_*`` — ``{'generator':…, 'encoder':…, 'quantizer':…}``
    state dicts (hificodec/train.py:303-313).

Tensor layout translations (ours -> torch):
    Conv1d   [K, I, O]    -> [O, I, K]
    ConvT1d  [K, I, O]    -> [I, O, K]
    Conv2d   [H, W, I, O] -> [O, I, H, W]
    LSTM     unchanged (we already store torch-layout ``[4H, C]``)

Norm parametrizations survive round trips: a weight-normed tree exports
``weight_v``/``weight_g`` keys (torch ``weight_norm`` checkpoints), a
folded tree (norm='none') exports plain ``weight``. The reference
constructs its modules WITH weight_norm before ``load_state_dict``, so
export from the training parametrization for reference interop and keep
folded trees for consumers that stripped it.

Arrays come back as float32 numpy (torch-loadable via ``to_torch`` /
``save_checkpoint_pth``); bf16 serving casts are promoted.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np32(v) -> np.ndarray:
    a = np.asarray(v)
    if a.dtype != np.float32 and np.issubdtype(a.dtype, np.floating):
        a = a.astype(np.float32)
    # jax bf16 arrives as a custom dtype numpy fails to promote implicitly
    if a.dtype.name == "bfloat16":
        a = a.astype(np.float32)
    return a


def _conv1d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))  # [K,I,O] -> [O,I,K]


def _convt1d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 2, 0))  # [K,I,O] -> [I,O,K]


def _conv2d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))  # [H,W,I,O] -> [O,I,H,W]


def _emit_conv(
    sd: Dict[str, np.ndarray],
    torch_prefix: str,
    conv: Mapping[str, Any],
    is_transposed: bool,
):
    """Write one conv's params under ``torch_prefix`` (inverse of
    torch_import._conv_param — including the transposed ``weight_g``)."""

    def trans(w):
        w = _np32(w)
        if w.ndim == 4:
            return _conv2d_w(w)
        return _convt1d_w(w) if is_transposed else _conv1d_w(w)

    name_map = {"kernel": "weight", "kernel_v": "weight_v", "kernel_g": "weight_g"}
    for ours, value in conv.items():
        if ours == "bias":
            sd[f"{torch_prefix}.bias"] = _np32(value)
        elif ours in name_map:
            sd[f"{torch_prefix}.{name_map[ours]}"] = trans(value)
        else:
            raise KeyError(f"unexportable conv param {torch_prefix}/{ours}")


_LSTM_PARAMS = ("weight_ih", "weight_hh", "bias_ih", "bias_hh")


def export_soundstream(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """``{'params':…, 'codebook':…}`` -> flat reference-SoundStream
    state_dict (inverse of torch_import.import_soundstream)."""
    sd: Dict[str, np.ndarray] = {}

    vq = variables["codebook"]["quantizer"]["vq"]
    embed = _np32(vq["embed"])
    embed_avg = _np32(vq["embed_avg"])
    cluster_size = _np32(vq["cluster_size"])
    inited = np.asarray(vq["inited"]).reshape(-1)
    for i in range(embed.shape[0]):
        base = f"quantizer.vq.layers.{i}._codebook."
        sd[base + "embed"] = embed[i]
        sd[base + "embed_avg"] = embed_avg[i]
        sd[base + "cluster_size"] = cluster_size[i]
        # reference registers inited as torch.Tensor([bool]) — shape [1] f32
        # (quantization/core_vq.py:134)
        sd[base + "inited"] = np.asarray([float(inited[i])], np.float32)

    unknown = set(variables["params"]) - {"encoder", "decoder"}
    if unknown:
        raise KeyError(
            f"unexportable SoundStream param trees {sorted(unknown)}: the "
            "reference state_dict holds encoder/decoder/quantizer-EMA only"
        )
    for tower in ("encoder", "decoder"):
        for mod_name, mod in variables["params"][tower].items():
            assert mod_name.startswith("model_"), mod_name
            idx = mod_name[len("model_") :]
            prefix = f"{tower}.model.{idx}"
            for sub, node in mod.items():
                if sub == "conv":
                    _emit_conv(sd, f"{prefix}.conv.conv", node, is_transposed=False)
                elif sub == "convtr":
                    _emit_conv(sd, f"{prefix}.convtr.convtr", node, is_transposed=True)
                elif sub == "shortcut":
                    _emit_conv(
                        sd, f"{prefix}.shortcut.conv.conv", node["conv"], False
                    )
                elif sub.startswith("block_"):
                    j = sub[len("block_") :]
                    _emit_conv(
                        sd, f"{prefix}.block.{j}.conv.conv", node["conv"], False
                    )
                elif sub.startswith("l") and sub[1:].isdigit():
                    for pname in _LSTM_PARAMS:
                        sd[f"{prefix}.lstm.{pname}_l{sub[1:]}"] = _np32(node[pname])
                else:
                    raise KeyError(f"unexportable module {tower}/{mod_name}/{sub}")
    return sd


def _export_hifigan_tower(
    params: Mapping[str, Any], transposed_ups: bool
) -> Dict[str, np.ndarray]:
    """Inverse of torch_import._import_hifigan_tower."""
    sd: Dict[str, np.ndarray] = {}
    for name, node in params.items():
        if name in ("conv_pre", "conv_post"):
            _emit_conv(sd, name, node, is_transposed=False)
        elif name.startswith("ups_"):
            _emit_conv(
                sd, f"ups.{name[len('ups_'):]}", node, is_transposed=transposed_ups
            )
        elif name.startswith("resblocks_"):
            i = name[len("resblocks_") :]
            for conv_name, conv in node.items():
                # convs1_2 -> convs1.2 (ResBlock1), convs_0 -> convs.0 (ResBlock2)
                stem, j = conv_name.rsplit("_", 1)
                _emit_conv(sd, f"resblocks.{i}.{stem}.{j}", conv, False)
        elif name.startswith("normalize_"):
            i = name[len("normalize_") :]
            sd[f"normalize.{i}.weight"] = _np32(node["scale"])
            sd[f"normalize.{i}.bias"] = _np32(node["bias"])
        else:
            raise KeyError(f"unexportable module {name}")
    return sd


def export_hificodec(variables: Mapping[str, Any]) -> Dict[str, Dict[str, np.ndarray]]:
    """VQVAE ``{'params':…}`` -> reference ``g_*`` checkpoint dict
    (inverse of torch_import.import_hificodec)."""
    p = variables["params"]
    codebooks = _np32(p["quantizer"]["codebooks"])  # [2, G, bins, dim]
    q: Dict[str, np.ndarray] = {}
    for g in range(codebooks.shape[1]):
        q[f"quantizer_modules.{g}.embedding.weight"] = codebooks[0, g]
        q[f"quantizer_modules2.{g}.embedding.weight"] = codebooks[1, g]
    return {
        "generator": _export_hifigan_tower(p["generator"], transposed_ups=True),
        "encoder": _export_hifigan_tower(p["encoder"], transposed_ups=False),
        "quantizer": q,
    }


def to_torch(tree):
    """Numpy state dict(s) -> torch tensors (recursively)."""
    import torch

    if isinstance(tree, Mapping):
        return {k: to_torch(v) for k, v in tree.items()}
    return torch.from_numpy(np.ascontiguousarray(tree))


def save_checkpoint_pth(path: str, tree) -> None:
    """``torch.save`` the exported dict — loadable by the reference stack
    (test.py:172-178 / vqvae.py:13-29)."""
    import torch

    torch.save(to_torch(tree), path)
