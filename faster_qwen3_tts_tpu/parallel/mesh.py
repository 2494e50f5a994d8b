"""Device-mesh sharding for multi-chip serving.

The reference has NO distributed execution (SURVEY §2.3: scaling beyond one
request is a mutex). The TPU-native scaling story is SPMD over an ICI mesh:

- axis "dp": batched serving — independent requests sharded over the batch
  dimension of activations and the KV cache (each chip decodes its own
  requests; no cross-chip traffic on the hot path).
- axis "tp": tensor parallelism for latency on larger talkers — attention
  heads and MLP intermediate sharded over chips; XLA/GSPMD inserts the
  all-reduces (psum) on the residual stream, riding ICI.

Weights are annotated once with NamedShardings; every jitted engine function
then runs SPMD without code changes (GSPMD propagates shardings through the
scans). `tp` must divide num_key_value_heads (8 for all Qwen3-TTS sizes).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """Create a (dp, tp) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if tp is None:
        tp = 1 if dp is None else n_devices // dp
    if dp is None:
        dp = n_devices // tp
    assert dp * tp == n_devices, f"dp({dp}) * tp({tp}) != {n_devices}"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _layer_specs() -> Dict[str, P]:
    """PartitionSpecs for one stacked decoder-layer param dict
    (leading axis = layer). Megatron-style: column-parallel qkv/gate/up,
    row-parallel o/down."""
    return {
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "w_gate": P(None, None, "tp"),
        "w_up": P(None, None, "tp"),
        "w_down": P(None, "tp", None),
        "q_norm": P(None, None),
        "k_norm": P(None, None),
        "ln1": P(None, None),
        "ln2": P(None, None),
    }


def talker_param_specs() -> Dict[str, Any]:
    return {
        "text_embed": P(None, None),
        "text_proj": {"w": P(None, None), "b": P(None)},
        "codec_embed": P(None, None),
        "codec_head": P(None, "tp"),
        "spk_proj": {"w": P(None, None), "b": P(None)},
        "layers": _layer_specs(),
        "final_norm": P(None),
    }


def predictor_param_specs() -> Dict[str, Any]:
    return {
        "mtp_proj": {"w": P(None, None), "b": P(None)},
        "codec_embeds": P(None, None, None),
        "lm_heads": P(None, None, "tp"),
        "layers": _layer_specs(),
        "final_norm": P(None),
    }


def kv_cache_spec() -> P:
    """KVCache [L, B, S, kv_heads, hd]: batch over dp, kv heads over tp."""
    return P(None, "dp", None, "tp", None)


def state_specs(vocab_spec: P = P("dp", None)) -> Dict[str, Any]:
    """PartitionSpecs for engine.core.DecodeState fields (batch over dp)."""
    from ..models.layers import KVCache
    from ..engine.core import DecodeState

    return DecodeState(
        cache=KVCache(k=kv_cache_spec(), v=kv_cache_spec()),
        pos=P("dp"),
        num_pads=P("dp"),
        token=P("dp"),
        past_hidden=P("dp", None, None),
        gen_step=P("dp"),
        seen=vocab_spec,
        key=P(),
        done=P("dp"),
        n_frames=P("dp"),
    )


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place talker/predictor params on the mesh with TP shardings (codec and
    other submodels replicated).

    Quantized weights: int8 QuantizedLinear shards exactly like its plain
    counterpart — q takes the weight spec; the per-output-channel scale
    [.., 1, out] shards only on the OUT axis (its dim -2 is size 1, so a
    row-parallel axis there is dropped). Row-parallel int8 stays exact under
    TP because GSPMD all-reduces the int8 partial dot BEFORE the replicated
    per-output scale multiply (ops/quant.dot applies scale after the
    contraction). Grouped-int4 QuantizedLinear4 is replicated (its
    interleaved nibble packing does not shard cleanly; int4 is a footprint
    option, not the TP serving mode)."""
    from ..ops.quant import QuantizedLinear, QuantizedLinear4

    specs = {
        "talker": talker_param_specs(),
        "predictor": predictor_param_specs(),
    }

    def norm_spec(s: P, rank: int) -> tuple:
        t = tuple(s) + (None,) * (rank - len(tuple(s)))
        return t[:rank]

    def place(tree, spec):
        if isinstance(tree, QuantizedLinear):
            qs = norm_spec(spec if isinstance(spec, P) else P(), tree.q.ndim)
            ss = qs[:-2] + (None, qs[-1])
            return QuantizedLinear(
                q=jax.device_put(tree.q, NamedSharding(mesh, P(*qs))),
                scale=jax.device_put(tree.scale, NamedSharding(mesh, P(*ss))),
            )
        if isinstance(tree, QuantizedLinear4):
            return QuantizedLinear4(
                *(jax.device_put(f, NamedSharding(mesh, P())) for f in tree)
            )
        if isinstance(tree, dict):
            return {k: place(v, spec[k] if isinstance(spec, dict) else spec) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(place(v, spec) for v in tree)
        s = spec if isinstance(spec, P) else P()
        return jax.device_put(tree, NamedSharding(mesh, s))

    out = {}
    for key, sub in params.items():
        if key in specs:
            out[key] = place(sub, specs[key])
        else:
            out[key] = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), sub
            )
    return out
