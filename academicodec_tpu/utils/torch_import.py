"""Import PyTorch AcademiCodec checkpoints into this framework's pytrees.

Supports the two public checkpoint formats:

  * Encodec/SoundStream ``.pth`` — a flat ``state_dict`` of the reference
    ``SoundStream`` module (possibly with DDP ``module.`` prefixes,
    reference test.py:172-178), weight-norm parametrized
    (``weight_g``/``weight_v``) or folded (plain ``weight``).
  * HiFi-Codec ``g_*`` — a dict with ``generator``/``encoder``/``quantizer``
    state dicts (reference vqvae.py:13-29).

Tensor layout translations (torch -> ours):
    Conv1d   [O, I, K]    -> [K, I, O]
    ConvT1d  [I, O, K]    -> [K, I, O]
    Conv2d   [O, I, H, W] -> [H, W, I, O]
    LSTM     unchanged (we store torch-layout ``[4H, C]``)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def strip_ddp_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv1d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def _convt1d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 0, 1))


def _conv2d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv_param(flax_path_prefix, params, torch_key_tail, w, is_transposed):
    """Map a torch conv weight/bias/weight_g/weight_v onto our conv params."""
    w = _np(w)
    if torch_key_tail == "bias":
        _set(params, flax_path_prefix + ("bias",), w)
        return
    trans = _convt1d_w if is_transposed else _conv1d_w
    trans2d = _conv2d_w
    is2d = w.ndim == 4
    if torch_key_tail == "weight":
        _set(params, flax_path_prefix + ("kernel",), trans2d(w) if is2d else trans(w))
    elif torch_key_tail == "weight_v":
        _set(params, flax_path_prefix + ("kernel_v",), trans2d(w) if is2d else trans(w))
    elif torch_key_tail == "weight_g":
        _set(params, flax_path_prefix + ("kernel_g",), trans2d(w) if is2d else trans(w))
    elif torch_key_tail == "weight_orig":  # spectral norm
        _set(params, flax_path_prefix + ("kernel",), trans2d(w) if is2d else trans(w))
    else:
        raise KeyError(torch_key_tail)


_LSTM_RE = re.compile(r"(weight_ih|weight_hh|bias_ih|bias_hh)_l(\d+)")


def import_soundstream(state_dict: Mapping[str, Any], n_q: int) -> Dict[str, Any]:
    """Flat reference-SoundStream state_dict -> ``{'params':…, 'codebook':…}``.

    Handles both weight-normed and folded (``remove_weight_norm``-ed)
    checkpoints; the caller must construct the model with the matching
    ``norm`` setting ('weight_norm' vs 'none').
    """
    sd = strip_ddp_prefix(dict(state_dict))
    params: dict = {}
    # stacked codebook buffers [n_q, ...]
    cb: Dict[str, list] = {"embed": [], "embed_avg": [], "cluster_size": [], "inited": []}

    for i in range(n_q):
        base = f"quantizer.vq.layers.{i}._codebook."
        cb["embed"].append(_np(sd.pop(base + "embed")))
        cb["embed_avg"].append(_np(sd.pop(base + "embed_avg")))
        cb["cluster_size"].append(_np(sd.pop(base + "cluster_size")))
        cb["inited"].append(_np(sd.pop(base + "inited")))

    codebook = {
        "quantizer": {
            "vq": {
                "embed": np.stack(cb["embed"]),
                "embed_avg": np.stack(cb["embed_avg"]),
                "cluster_size": np.stack(cb["cluster_size"]),
                "inited": np.stack(cb["inited"]).reshape(n_q).astype(bool),
            }
        }
    }

    for key, value in sd.items():
        parts = key.split(".")
        tower = parts[0]  # encoder | decoder
        assert tower in ("encoder", "decoder"), key
        assert parts[1] == "model"
        idx = parts[2]
        rest = parts[3:]
        prefix = (tower, f"model_{idx}")
        if rest[0] == "lstm":
            m = _LSTM_RE.fullmatch(rest[1])
            assert m, key
            _set(params, prefix + (f"l{m.group(2)}", m.group(1)), _np(value))
        elif rest[0] == "block":
            sub = ("block_" + rest[1], "conv")
            _conv_param(prefix + sub, params, rest[-1], value, is_transposed=False)
        elif rest[0] == "shortcut":
            _conv_param(prefix + ("shortcut", "conv"), params, rest[-1], value, False)
        elif rest[0] == "conv":
            _conv_param(prefix + ("conv",), params, rest[-1], value, False)
        elif rest[0] == "convtr":
            _conv_param(prefix + ("convtr",), params, rest[-1], value, True)
        else:
            raise KeyError(key)

    return {"params": params, "codebook": codebook}


def _import_hifigan_tower(sd: Mapping[str, Any], transposed_ups: bool) -> dict:
    """Shared walker for the HiFi-Codec encoder/generator state dicts."""
    params: dict = {}
    for key, value in strip_ddp_prefix(dict(sd)).items():
        parts = key.split(".")
        head = parts[0]
        if head in ("conv_pre", "conv_post"):
            _conv_param((head,), params, parts[-1], value, is_transposed=False)
        elif head == "ups":
            _conv_param(
                (f"ups_{parts[1]}",), params, parts[-1], value, is_transposed=transposed_ups
            )
        elif head == "resblocks":
            sub = (f"resblocks_{parts[1]}", f"{parts[2]}_{parts[3]}")
            _conv_param(sub, params, parts[-1], value, is_transposed=False)
        elif head == "normalize":
            name = "scale" if parts[-1] == "weight" else "bias"
            _set(params, (f"normalize_{parts[1]}", name), _np(value))
        else:
            raise KeyError(key)
    return params


def import_hificodec(ckpt: Mapping[str, Any], n_groups: int = 2) -> Dict[str, Any]:
    """Reference HiFi-Codec ``g_*`` checkpoint -> ``{'params': …}`` for VQVAE."""
    enc = _import_hifigan_tower(ckpt["encoder"], transposed_ups=False)
    gen = _import_hifigan_tower(ckpt["generator"], transposed_ups=True)
    q = strip_ddp_prefix(dict(ckpt["quantizer"]))
    layer0 = [
        _np(q[f"quantizer_modules.{g}.embedding.weight"]) for g in range(n_groups)
    ]
    layer1 = [
        _np(q[f"quantizer_modules2.{g}.embedding.weight"]) for g in range(n_groups)
    ]
    codebooks = np.stack([np.stack(layer0), np.stack(layer1)])
    return {
        "params": {
            "encoder": enc,
            "generator": gen,
            "quantizer": {"codebooks": codebooks},
        }
    }


def validate_tree(expected, got, path=""):
    """Recursively compare two pytrees of array shapes; raise with a precise
    path on mismatch (guards importer drift)."""
    if isinstance(expected, Mapping):
        missing = set(expected) - set(got)
        extra = set(got) - set(expected)
        if missing or extra:
            raise ValueError(f"at {path}: missing={sorted(missing)} extra={sorted(extra)}")
        for k in expected:
            validate_tree(expected[k], got[k], f"{path}/{k}")
    else:
        es = tuple(expected.shape)
        gs = tuple(np.shape(got))
        if es != gs:
            raise ValueError(f"shape mismatch at {path}: expected {es}, got {gs}")
