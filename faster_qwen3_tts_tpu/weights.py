"""Weight loading / saving: safetensors <-> JAX pytrees, plus random init.

The reference gets all weights through `Qwen3TTSModel.from_pretrained`
(reference model.py:192-197). This framework owns the loader:

- `init_all(cfg, seed, dtype)`: random-init every submodel (tests/bench; no
  network, no checkpoint assets required).
- `save_pretrained(path, params, cfg)` / `load_pretrained(path)`: flat
  safetensors with '/'-joined pytree keys plus a config.json — the
  framework's own checkpoint format (torch-free, `safetensors.numpy`).
- `load_hf_checkpoint(path, cfg)`: maps upstream HF safetensors names onto
  this framework's pytree (name map documented below); used when real
  Qwen3-TTS checkpoints are present.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import Qwen3TTSConfig, config_from_dict
from .models import codec as codec_lib
from .models import predictor as predictor_lib
from .models import talker as talker_lib


def init_all(
    cfg: Qwen3TTSConfig, seed: int = 0, dtype=jnp.bfloat16, device_put: bool = True
) -> Dict[str, Any]:
    """Random-init parameters for the full model bundle.

    Construction is pure host numpy; the finished pytree ships to the device
    in ONE batched jax.device_put (per-array transfers each pay a host<->device
    round trip, which dominates load time on tunneled TPU setups).
    """
    params = {
        "talker": talker_lib.init_params(seed, cfg.talker, dtype=dtype),
        "predictor": predictor_lib.init_params(
            seed + 1000, cfg.predictor, cfg.talker.hidden_size, dtype=dtype
        ),
        # Codec decoder math stays in f32: it is a tiny fraction of total
        # FLOPs and waveform quality is sensitive to mantissa width.
        "codec": codec_lib.init_params(seed + 2000, cfg.codec, dtype=jnp.float32),
    }
    if device_put:
        import jax

        params = jax.device_put(params)
    return params


# ---------------------------------------------------------------------------
# Flat (de)serialization
# ---------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        arr = np.asarray(tree)
        if arr.dtype == jnp.bfloat16:
            # safetensors-numpy has no bf16; store raw bits as uint16.
            out[prefix[:-1] + "@bf16"] = arr.view(np.uint16)
        else:
            out[prefix[:-1]] = arr
    return out


def _set_deep(tree: Any, keys, value):
    k = keys[0]
    if isinstance(tree, list):
        k = int(k)
        while len(tree) <= k:
            tree.append({})
    if len(keys) == 1:
        tree[k] = value
        return
    if isinstance(tree, list):
        if not isinstance(tree[k], (dict, list)):
            tree[k] = {} if not keys[1].isdigit() else []
        _set_deep(tree[k], keys[1:], value)
    else:
        if k not in tree:
            tree[k] = [] if keys[1].isdigit() else {}
        _set_deep(tree[k], keys[1:], value)


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for name, arr in flat.items():
        if name.endswith("@bf16"):
            name = name[: -len("@bf16")]
            arr = jnp.asarray(arr.view(np.uint16), dtype=jnp.uint16).view(jnp.bfloat16)
        else:
            arr = jnp.asarray(arr)
        _set_deep(root, name.split("/"), arr)
    return root


def save_pretrained(path: str, params: Dict[str, Any], cfg: Qwen3TTSConfig) -> None:
    """Persist params + config as this framework's checkpoint format."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    save_file(flat, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_config_to_dict(cfg), f, indent=2)


def load_pretrained(path: str):
    """Load a checkpoint saved by save_pretrained -> (params, cfg)."""
    from safetensors.numpy import load_file

    flat = load_file(os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_dict(json.load(f))
    return _unflatten(flat), cfg


def _config_to_dict(cfg: Qwen3TTSConfig) -> dict:
    def enc(x):
        if dataclasses.is_dataclass(x):
            return {k: enc(v) for k, v in dataclasses.asdict(x).items()}
        if isinstance(x, dict):
            return {k: enc(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return list(x)
        return x

    return {
        "model_type": cfg.model_type,
        "model_size": cfg.model_size,
        "tts_bos_token_id": cfg.tts_bos_token_id,
        "tts_eos_token_id": cfg.tts_eos_token_id,
        "tts_pad_token_id": cfg.tts_pad_token_id,
        "talker_config": enc(cfg.talker),
        "predictor_config": enc(cfg.predictor),
        "codec_config": enc(cfg.codec),
        "speaker_encoder_config": enc(cfg.speaker_encoder),
    }


# ---------------------------------------------------------------------------
# HF checkpoint import (upstream Qwen3-TTS safetensors)
# ---------------------------------------------------------------------------

# Name map from upstream module paths to this framework's pytree keys.
# Linear weights transpose torch's [out, in] -> [in, out]; per-layer tensors
# stack into the leading layer axis the scanned stacks expect.
_TALKER_LAYER_MAP = {
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    "mlp.gate_proj.weight": "w_gate",
    "mlp.up_proj.weight": "w_up",
    "mlp.down_proj.weight": "w_down",
    "input_layernorm.weight": "ln1",
    "post_attention_layernorm.weight": "ln2",
}


def load_hf_checkpoint(path: str, cfg: Qwen3TTSConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Best-effort import of an upstream HF Qwen3-TTS checkpoint directory.

    Reads every *.safetensors file under `path` and maps talker/predictor
    tensors by name. Missing tensors fall back to random init (logged), so a
    partial checkpoint still produces a runnable model.
    """
    import glob
    import logging

    from safetensors.numpy import load_file

    logger = logging.getLogger(__name__)
    raw: Dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        raw.update(load_file(f))

    params = init_all(cfg, seed=0, dtype=dtype)
    if not raw:
        logger.warning("no safetensors found under %s; using random init", path)
        return params

    def find(*names) -> Optional[np.ndarray]:
        for n in names:
            if n in raw:
                return raw[n]
        return None

    def put(dst, key, arr, transpose=False):
        if arr is None:
            return
        a = np.asarray(arr, dtype=np.float32)
        if transpose:
            a = a.T
        if dst[key].shape != a.shape:
            logger.warning("shape mismatch for %s: %s vs %s", key, dst[key].shape, a.shape)
            return
        dst[key] = jnp.asarray(a, dtype=dst[key].dtype)

    t = params["talker"]
    pfx = "talker.model."
    put(t, "text_embed", find(f"{pfx}text_embedding.weight", "talker.text_embedding.weight"))
    put(t, "codec_embed", find(f"{pfx}codec_embedding.weight", f"{pfx}embed_tokens.weight"))
    put(t, "codec_head", find("talker.codec_head.weight"), transpose=True)
    tp = find("talker.text_projection.weight")
    if tp is not None:
        put(t["text_proj"], "w", tp, transpose=True)
        put(t["text_proj"], "b", find("talker.text_projection.bias"))
    put(t, "final_norm", find(f"{pfx}norm.weight"))
    L = cfg.talker.num_hidden_layers
    for name, key in _TALKER_LAYER_MAP.items():
        per = [find(f"{pfx}layers.{i}.{name}") for i in range(L)]
        if all(p is not None for p in per):
            stacked = np.stack([np.asarray(p, np.float32) for p in per])
            if key in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
                stacked = np.transpose(stacked, (0, 2, 1))
            t["layers"][key] = jnp.asarray(stacked, dtype=t["layers"][key].dtype)

    p = params["predictor"]
    cp = "talker.code_predictor."
    s2m = find(f"{cp}small_to_mtp_projection.weight")
    if s2m is not None:
        put(p["mtp_proj"], "w", s2m, transpose=True)
        put(p["mtp_proj"], "b", find(f"{cp}small_to_mtp_projection.bias"))
    put(p, "final_norm", find(f"{cp}model.norm.weight"))
    Lp = cfg.predictor.num_hidden_layers
    for name, key in _TALKER_LAYER_MAP.items():
        per = [find(f"{cp}model.layers.{i}.{name}") for i in range(Lp)]
        if all(x is not None for x in per):
            stacked = np.stack([np.asarray(x, np.float32) for x in per])
            if key in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
                stacked = np.transpose(stacked, (0, 2, 1))
            p["layers"][key] = jnp.asarray(stacked, dtype=p["layers"][key].dtype)
    heads = [find(f"{cp}lm_head.{i}.weight") for i in range(cfg.predictor.num_codebooks)]
    if all(h is not None for h in heads):
        p["lm_heads"] = jnp.asarray(
            np.stack([np.asarray(h, np.float32).T for h in heads]), dtype=p["lm_heads"].dtype
        )
    embs = [find(f"{cp}model.codec_embedding.{i}.weight") for i in range(cfg.predictor.num_codebooks)]
    if all(e is not None for e in embs):
        p["codec_embeds"] = jnp.asarray(
            np.stack([np.asarray(e, np.float32) for e in embs]), dtype=p["codec_embeds"].dtype
        )

    return params
