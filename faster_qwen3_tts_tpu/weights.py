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
import hashlib
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
    cfg: Qwen3TTSConfig, seed: int = 0, dtype=jnp.bfloat16, device_put: bool = True, rng=None
) -> Dict[str, Any]:
    """Random-init parameters for the full model bundle.

    Construction is pure host numpy; the finished pytree ships to the device
    in ONE batched jax.device_put (per-array transfers each pay a host<->device
    round trip, which dominates load time on tunneled TPU setups).
    """
    params = {
        "talker": talker_lib.init_params(seed, cfg.talker, dtype=dtype, rng=rng),
        "predictor": predictor_lib.init_params(
            seed + 1000, cfg.predictor, cfg.talker.hidden_size, dtype=dtype, rng=rng
        ),
        # Codec decoder math stays in f32: it is a tiny fraction of total
        # FLOPs and waveform quality is sensitive to mantissa width.
        "codec": codec_lib.init_params(seed + 2000, cfg.codec, dtype=jnp.float32, rng=rng),
    }
    if device_put:
        import jax

        params = jax.device_put(params)
    return params


# Sentinel magnitude used by the deferred-init skeleton. Small enough that
# (sentinel * any init scale) is unambiguously distinguishable from real
# initialized values, large enough to stay a normal number in bfloat16.
_INIT_SENTINEL = 1e-30


class _SentinelArray:
    """Lazy constant 'array' for the init skeleton: O(1) memory and O(1)
    for the scale-multiplies and dtype casts the init code applies. Every
    random-init leaf in this codebase is `standard_normal(shape) * scale`
    (possibly then `.astype(...)` / `np.asarray(..., dtype)`), so supporting
    `*`, `astype` and `__array__` with a broadcast view covers them all —
    without materializing or converting ~1 B elements on the host (measured:
    minutes of single-core numpy/ml_dtypes time for the real skeleton)."""

    def __init__(self, shape, value):
        import numpy as np

        self.shape = tuple(shape)
        self.value = float(value)
        self._np = np

    def __mul__(self, scale):
        return _SentinelArray(self.shape, self.value * float(scale))

    __rmul__ = __mul__

    def __truediv__(self, x):
        return _SentinelArray(self.shape, self.value / float(x))

    def astype(self, dtype):
        return self._np.broadcast_to(self._np.asarray(self.value, dtype), self.shape)

    def __array__(self, dtype=None, copy=None):
        return self._np.broadcast_to(
            self._np.asarray(self.value, dtype or self._np.float32), self.shape
        )


class _SentinelRng:
    """Stub RNG for `init_all_device`: standard_normal returns a lazy
    constant `_INIT_SENTINEL` array. Since every random-init leaf is
    `standard_normal(shape) * scale`, the resulting leaf value encodes its
    init scale (= value / sentinel), which the device-side generator
    recovers. Non-random leaves (ones/zeros/constant fills) don't touch the
    RNG and come out exact."""

    def standard_normal(self, shape, dtype=None):
        return _SentinelArray(shape, _INIT_SENTINEL)


def init_all_device(cfg: Qwen3TTSConfig, seed: int = 0, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Random-init the full bundle ON DEVICE — no host-side RNG, no bulk
    host->device weight transfer.

    Host random init of the ~1B-parameter bundle takes minutes of single-core
    numpy time and the ~2 GB transfer takes minutes more through a tunneled
    TPU connection (measured: ~10 min + ~6 min for 0.6B in this environment).
    Here the host builds only a sentinel-filled skeleton (milliseconds), and
    one jitted program regenerates every random leaf with `jax.random.normal`
    at its recovered init scale directly in HBM. Weight VALUES differ from
    `init_all` (different RNG), so golden/parity fixtures keep using the host
    path; benchmarks opt in via FQ3T_DEVICE_INIT=1.
    """
    import jax

    skeleton = init_all(cfg, seed=seed, dtype=dtype, device_put=False, rng=_SentinelRng())
    skeleton = jax.tree.map(np.asarray, skeleton)
    ids = {id(l) for l in jax.tree_util.tree_leaves(skeleton)}
    # _finalize (shared with load_hf_checkpoint) regenerates every leaf that
    # holds the sentinel with device-side RNG at its recovered scale and
    # ships the constant leaves in one batched transfer.
    return _finalize(skeleton, ids, device_put_flag=True, seed=seed)


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
    """Rebuild the pytree HOST-side (numpy leaves). A previous version did
    `jnp.asarray` per leaf here — 188 eager device transfers at ~0.35 s each
    through a tunneled runtime, the entire 115 s "checkpoint read" phase of
    the round-4 warm-restart capture. Device placement now happens in ONE
    packed transfer (`pack_transfer`) after optional quantization."""
    import ml_dtypes

    root: Dict[str, Any] = {}
    for name, arr in flat.items():
        if name.endswith("@bf16"):
            name = name[: -len("@bf16")]
            arr = arr.view(ml_dtypes.bfloat16)
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


def is_own_checkpoint(path: str) -> bool:
    """True if `path` holds this framework's save_pretrained format.

    Both our format and a single-file upstream HF checkpoint can be named
    model.safetensors; the discriminator is the key style (ours uses
    '/'-separated pytree paths, upstream uses '.'-separated module paths).
    """
    f = os.path.join(path, "model.safetensors")
    if not os.path.exists(f):
        return False
    from safetensors import safe_open

    with safe_open(f, framework="pt", device="cpu") as h:
        for k in h.keys():
            return "/" in k
    return False


def load_pretrained(path: str):
    """Load a checkpoint saved by save_pretrained -> (params, cfg).
    Leaves are HOST numpy; callers device-place via pack_transfer."""
    from safetensors.numpy import load_file

    flat = load_file(os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_dict(json.load(f))
    return _unflatten(flat), cfg


# ---------------------------------------------------------------------------
# Packed single-buffer device transfer + deploy bundles
#
# Through a tunneled PJRT runtime every host->device transfer costs ~0.35 s
# of per-RPC latency regardless of size, while ONE large buffer streams at
# link bandwidth (~10 MB/s measured through this v5e tunnel once actually
# flushed; GB/s on attached hardware). A 188-leaf parameter tree
# therefore takes minutes leaf-by-leaf but seconds as one blob. These
# helpers concatenate every leaf's raw bytes into a single uint8 buffer,
# ship it with ONE device_put, and re-slice/bitcast/reshape the leaves in a
# single jitted (AOT-cacheable) program on device. Works for quantized
# trees too (QuantizedLinear/QuantizedLinear4 nodes are encoded in the key
# path). `save_deploy_bundle`/`load_deploy_bundle` persist the packed form
# (optionally pre-quantized), making a serving restart: read one file ->
# one transfer -> one unpack program.
# ---------------------------------------------------------------------------

_QL8_MARK = "@ql8"
_QL4_MARK = "@ql4"


def _flatten_typed(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """_flatten that also encodes quantized NamedTuple nodes in the path."""
    from .ops import quant as quant_lib

    if isinstance(tree, quant_lib.QuantizedLinear):
        base = prefix[:-1] + _QL8_MARK
        return {
            **_flatten_typed(tree.q, f"{base}/q/"),
            **_flatten_typed(tree.scale, f"{base}/scale/"),
        }
    if isinstance(tree, quant_lib.QuantizedLinear4):
        base = prefix[:-1] + _QL4_MARK
        return {
            **_flatten_typed(tree.packed, f"{base}/packed/"),
            **_flatten_typed(tree.scale, f"{base}/scale/"),
            **_flatten_typed(tree.wmin, f"{base}/wmin/"),
        }
    if isinstance(tree, dict):
        out: Dict[str, np.ndarray] = {}
        for k in sorted(tree):
            out.update(_flatten_typed(tree[k], f"{prefix}{k}/"))
        return out
    if isinstance(tree, (list, tuple)):
        out = {}
        for i, v in enumerate(tree):
            out.update(_flatten_typed(v, f"{prefix}{i}/"))
        return out
    return {prefix[:-1]: np.asarray(tree)}


def _rebuild_typed(flat: Dict[str, Any]) -> Any:
    """Inverse of _flatten_typed: leaves may be numpy OR device arrays."""
    from .ops import quant as quant_lib

    root: Dict[str, Any] = {}
    for name, arr in flat.items():
        _set_deep(root, name.split("/"), arr)

    def convert(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                v = convert(v)
                if k.endswith(_QL8_MARK):
                    out[k[: -len(_QL8_MARK)]] = quant_lib.QuantizedLinear(
                        q=v["q"], scale=v["scale"]
                    )
                elif k.endswith(_QL4_MARK):
                    out[k[: -len(_QL4_MARK)]] = quant_lib.QuantizedLinear4(
                        packed=v["packed"], scale=v["scale"], wmin=v["wmin"]
                    )
                else:
                    out[k] = v
            return out
        if isinstance(node, list):
            return [convert(v) for v in node]
        return node

    return convert(root)


def _np_dtype(dt: str) -> np.dtype:
    # "bfloat16" resolves through jnp (ml_dtypes); the rest are numpy names
    return np.dtype(getattr(jnp, dt)) if hasattr(jnp, dt) else np.dtype(dt)


def _pack_blobs(flat: Dict[str, np.ndarray]):
    """-> (blobs {dtype_str: typed 1-D array}, manifest of
    (key, dtype, shape, elem_offset)). One mega-array PER DTYPE: a uint8
    blob + on-device bitcast was tried first, but TPU tile padding turns a
    [n, itemsize] uint8 reshape into a 32x HBM blowup (57 GB for a 1.8 GB
    tree — compile-time OOM). Typed blobs need zero bitcasts: the unpack is
    pure slice+reshape."""
    order: Dict[str, list] = {}
    for key, arr in flat.items():
        order.setdefault(str(arr.dtype), []).append(key)
    entries = []
    blobs: Dict[str, np.ndarray] = {}
    for dt, keys in order.items():
        offset = 0
        parts = []
        for key in keys:
            arr = np.ascontiguousarray(flat[key])
            entries.append((key, dt, tuple(arr.shape), offset))
            offset += arr.size
            parts.append(arr.reshape(-1))
        blobs[dt] = np.concatenate(parts) if parts else np.empty(0, _np_dtype(dt))
    return blobs, tuple(entries)


def _blob_kw(dt: str) -> str:
    return "b_" + dt


def _norm_manifest(manifest):
    """Normalize entries to (key, store_dt, shape, off, out_dt); 4-field
    entries (store == out, the uncompacted form) are padded."""
    return tuple(
        (e[0], e[1], tuple(e[2]), e[3], e[4] if len(e) > 4 else e[1])
        for e in manifest
    )


def _unpack_jit_factory(manifest, donate: bool = True):
    """Jitted unpack: per-dtype blobs -> (leaves list (manifest order), chk).
    The manifest is baked into the trace (it IS the program), so the AOT
    cache name carries its digest — two geometries never share an entry.
    Entries whose out_dt differs from the stored dtype (compact_f32 bundles:
    f32 leaves stored as bf16) are upcast on device, inside this program.

    `chk` is a scalar that data-depends on EVERY input blob: fetching it is
    the only reliable way to prove the host->device transfers actually
    landed (see _device_unpack)."""
    import jax
    import jax.numpy as jnp

    manifest = _norm_manifest(manifest)
    dts = sorted({dt for (_k, dt, _s, _o, _t) in manifest})

    def unpack(**blobs):
        out = []
        for (_key, dt, shape, off, out_dt) in manifest:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            seg = jax.lax.slice(blobs[_blob_kw(dt)], (off,), (off + n,))
            seg = seg.reshape(shape)
            if out_dt != dt:
                seg = seg.astype(_np_dtype(out_dt))
            out.append(seg)
        # One pass over every blob (milliseconds at HBM rate); the scalar
        # cannot exist until every transferred byte has landed on device.
        chk = sum(jnp.sum(b.astype(jnp.float32)) for b in blobs.values())
        return out, chk

    return jax.jit(unpack, donate_argnames=tuple(_blob_kw(d) for d in dts) if donate else ())


def _device_unpack(blobs: Dict[str, np.ndarray], manifest, sharding=None) -> Any:
    """device_put + unpack, FULLY FLUSHED before returning. `manifest`
    entries may carry a 5th out_dt field (compact storage; _norm_manifest).

    The flush is a real FETCH of a checksum scalar the unpack program
    computes from every input blob. Nothing weaker works through a tunneled
    PJRT client: `block_until_ready` on a fresh device_put returns in ms
    (client-side buffering), and an r5 on-chip capture showed even
    block_until_ready on the unpack OUTPUTS returning in 12 s while the
    1.37 GB of input bytes were still in flight — the first later fetch
    then stalled 432 s (the round-3 "block_until_ready doesn't force
    execution" lesson, again). A data-dependent fetch cannot lie. Either
    way the floor is the pipe: ~3-10 MB/s through this tunnel, GB/s on
    attached hardware. Fetching here keeps the cost attributed to the
    load's `device_transfer` phase instead of smearing into warmup."""
    import jax

    from .engine import aot

    dev = {}
    for dt, b in blobs.items():
        d = jax.device_put(b) if sharding is None else jax.device_put(b, sharding)
        dev[_blob_kw(dt)] = d
    manifest = _norm_manifest(manifest)
    digest = hashlib.sha256(repr(manifest).encode()).hexdigest()[:16]
    # "unpack2": the program's output signature changed (leaves -> (leaves,
    # chk)); a fresh name family keeps any cached single-output executable
    # from ever being considered.
    leaves, chk = aot.call(
        f"unpack2_weights-{digest}", _unpack_jit_factory(manifest), **dev
    )
    np.asarray(chk)  # the real flush: device->host fetch of the checksum
    return _rebuild_typed({key: leaf for (key, *_), leaf in zip(manifest, leaves)})


def pack_transfer(params: Any, sharding=None) -> Any:
    """Device-place a host parameter tree with ONE transfer per dtype (3-4
    total) + one unpack program, instead of one RPC per leaf (~0.35 s each
    through tunneled runtimes; 188 leaves = minutes vs link-rate streaming).

    sharding: optional target sharding for the blobs (single-device serving
    passes None; replicated-weight cases may pass a NamedSharding)."""
    flat = _flatten_typed(params)
    blobs, manifest = _pack_blobs(flat)
    return _device_unpack(blobs, manifest, sharding)


_BUNDLE_VERSION = 2


def is_deploy_bundle(path: str) -> bool:
    return os.path.exists(os.path.join(path, "bundle.bin")) and os.path.exists(
        os.path.join(path, "bundle.json")
    )


def save_deploy_bundle(path: str, params: Any, cfg: Qwen3TTSConfig,
                       quant_mode: str = "none", compact_f32: bool = False) -> None:
    """Persist params (optionally already quantized) in packed form.

    A restart then costs: one file read + one device transfer + one unpack
    program — the serving-grade warm path (the reference's warmup is
    seconds because its weights are already resident; this is the closest a
    fresh process can get).

    compact_f32=True stores float32 leaves as bfloat16 and upcasts them
    inside the on-device unpack program. For REAL Qwen3-TTS checkpoints this
    is lossless: the HF source tensors are bf16 (torch_dtype), and the f32
    leaves here (codec/encoders, kept f32 for compute) were upcast from that
    bf16 at import — bf16 -> f32 -> bf16 round-trips exactly. It cuts the
    restart's transfer bytes ~24% at 0.6B (the f32 section halves), which is
    wall-clock 1:1 on bandwidth-bound links. Only random-init f32 params
    (tests, benchmarks) actually lose mantissa bits; hence opt-in."""
    os.makedirs(path, exist_ok=True)
    flat = _flatten_typed(params)
    out_dt = {}
    if compact_f32:
        import ml_dtypes

        for k, a in flat.items():
            if a.dtype == np.float32:
                flat[k] = a.astype(ml_dtypes.bfloat16)
                out_dt[k] = "float32"
    blobs, manifest = _pack_blobs(flat)
    if out_dt:
        manifest = tuple(
            (k, dt, sh, off, out_dt.get(k, dt)) for (k, dt, sh, off) in manifest
        )
    sections = {}
    align = 128
    offset = 0
    with open(os.path.join(path, "bundle.bin"), "wb") as f:
        for dt in sorted(blobs):
            pad = (-offset) % align
            f.write(b"\0" * pad)
            offset += pad
            raw = blobs[dt].view(np.uint8)
            sections[dt] = [offset, int(blobs[dt].size)]
            f.write(raw.tobytes())
            offset += raw.size
    with open(os.path.join(path, "bundle.json"), "w") as f:
        json.dump({
            "version": _BUNDLE_VERSION,
            "quant": quant_mode,
            "sections": sections,
            "entries": [list(e) for e in manifest],
            "config": _config_to_dict(cfg),
        }, f)


def read_deploy_bundle(path: str):
    """Host half of a bundle load -> (blobs, manifest, cfg, quant_mode).
    Callers pass blobs/manifest to `_device_unpack` (the device half) so the
    disk read and the device transfer are separately attributable phases."""
    with open(os.path.join(path, "bundle.json")) as f:
        meta = json.load(f)
    if meta.get("version") != _BUNDLE_VERSION:
        raise ValueError(f"unsupported bundle version {meta.get('version')}")
    cfg = config_from_dict(meta["config"])
    manifest = _norm_manifest(meta["entries"])
    raw = np.fromfile(os.path.join(path, "bundle.bin"), dtype=np.uint8)
    blobs = {}
    for dt, (byte_off, n) in meta["sections"].items():
        dtype = _np_dtype(dt)
        blobs[dt] = raw[byte_off : byte_off + n * dtype.itemsize].view(dtype)
    return blobs, manifest, cfg, meta.get("quant", "none")


def load_deploy_bundle(path: str):
    """-> (device params, cfg, quant_mode). One file read, one transfer per
    dtype section, one unpack program (AOT-cached across restarts)."""
    blobs, manifest, cfg, mode = read_deploy_bundle(path)
    params = _device_unpack(blobs, manifest)
    return params, cfg, mode


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

# Upstream module-path suffixes for one decoder layer -> this framework's
# stacked-layer keys. Linear weights transpose torch's [out, in] -> [in, out];
# per-layer tensors stack into the leading layer axis the scans expect.
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

_LINEAR_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

# Code2Wav pre-transformer layers (no q/k norms; LayerScale per sublayer) —
# naming verified against transformers Qwen3OmniMoeCode2Wav (the public
# relative of the Qwen3-TTS 12Hz speech tokenizer; SURVEY §7 step 5).
_CODEC_LAYER_MAP = {
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
    "mlp.gate_proj.weight": "w_gate",
    "mlp.up_proj.weight": "w_up",
    "mlp.down_proj.weight": "w_down",
    "input_layernorm.weight": "ln1",
    "post_attention_layernorm.weight": "ln2",
    "self_attn_layer_scale.scale": "scale_attn",
    "mlp_layer_scale.scale": "scale_mlp",
}
_CODEC_LINEAR_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


class StrictLoadError(RuntimeError):
    """Raised in strict mode when any expected tensor is missing/mismatched."""


class _RawStore:
    """Lazy reader over every *.safetensors under a directory.

    Tensors load on demand (framework='pt' handles bf16 checkpoints, which
    safetensors-numpy cannot represent) and convert to float32 numpy.
    """

    def __init__(self, path: str):
        import glob

        from safetensors import safe_open

        self._handles = []
        self._index: Dict[str, int] = {}
        for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
            h = safe_open(f, framework="pt", device="cpu")
            i = len(self._handles)
            self._handles.append(h)
            for k in h.keys():
                self._index[k] = i

    def __bool__(self):
        return bool(self._index)

    def keys(self):
        return self._index.keys()

    def __contains__(self, name):
        return name in self._index

    def get(self, name: str) -> np.ndarray:
        t = self._handles[self._index[name]].get_tensor(name)
        return t.to(dtype=__import__("torch").float32).numpy()


def _find_prefix(raw, suffix: str, hint: str = "") -> Optional[str]:
    """Find the unique key prefix P such that P+suffix is a checkpoint tensor.

    `hint` breaks ties (prefer prefixes containing it). Upstream packagings
    differ in root naming ("talker." vs "model.talker." vs flat), so anchoring
    on distinctive suffixes is more robust than hardcoding roots.
    """
    cands = [k[: -len(suffix)] for k in raw.keys() if k.endswith(suffix)]
    if not cands:
        return None
    if len(cands) > 1 and hint:
        hinted = [c for c in cands if hint in c]
        if len(hinted) == 1:
            return hinted[0]
    return sorted(cands, key=len)[0]


class _Importer:
    """Accumulates tensor assignments with missing/mismatch accounting."""

    def __init__(self, raw: _RawStore):
        self.raw = raw
        self.used: set = set()
        self.missing: list = []
        self.mismatched: list = []

    def fetch(self, name: str, transform: Optional[str] = None) -> Optional[np.ndarray]:
        if name not in self.raw:
            return None
        a = self.raw.get(name)
        self.used.add(name)
        if transform == "lin":  # torch Linear [out, in] -> [in, out]
            a = a.T
        elif transform == "conv":  # torch Conv1d [out, in/g, k] -> [k, in/g, out]
            a = np.transpose(a, (2, 1, 0))
        elif transform == "tconv":
            # torch ConvTranspose1d [in, out, k] -> [k, in, out], spatially
            # FLIPPED: torch's transposed conv is the conv gradient (kernel
            # applied reversed); jax.lax.conv_transpose does not flip.
            a = np.transpose(a, (2, 0, 1))[::-1]
        return a

    def put(self, dst, key, name: str, transform: Optional[str] = None):
        """Assign one tensor into dst[key] (dict key or list index)."""
        a = self.fetch(name, transform)
        label = f"{name} -> {key}"
        if a is None:
            self.missing.append(label)
            return
        cur = dst[key]
        if tuple(cur.shape) != tuple(a.shape):
            self.mismatched.append(f"{label}: ckpt {a.shape} vs model {tuple(cur.shape)}")
            return
        dst[key] = jnp.asarray(a, dtype=cur.dtype)

    def put_stacked(self, dst, key, names, transform: Optional[str] = None):
        """Stack per-layer/per-codebook tensors into dst[key]'s leading axis."""
        per = [self.fetch(n, transform) for n in names]
        label = f"{names[0]}.. ({len(names)}) -> {key}"
        if any(p is None for p in per):
            self.missing.extend(n for n, p in zip(names, per) if p is None)
            return
        a = np.stack(per)
        cur = dst[key]
        if tuple(cur.shape) != tuple(a.shape):
            self.mismatched.append(f"{label}: ckpt {a.shape} vs model {tuple(cur.shape)}")
            return
        dst[key] = jnp.asarray(a, dtype=cur.dtype)

    def put_pair(self, dst, key, names):
        """(weight, bias) tuple leaves used by the encoder param layouts.
        Conv weights (3-D) arrive in torch [out, in/g, k] layout; 2-D linear
        weights are stored in this framework's [in, out] layout directly."""
        w_name, b_name = names
        w = self.fetch(w_name)
        b = self.fetch(b_name)
        if w is None or b is None:
            self.missing.extend(n for n, v in ((w_name, w), (b_name, b)) if v is None)
            return
        cur_w, cur_b = dst[key]
        if w.ndim == 3 and cur_w.ndim == 2 and w.shape[-1] == 1:
            # torch k=1 Conv1d [out, in, 1] used as a linear (ECAPA se_block
            # conv1/conv2, asp.conv, fc) -> this framework's [in, out]
            w = w[:, :, 0].T
        elif w.ndim == 3:
            w = np.transpose(w, (2, 1, 0))
        elif w.ndim == 2 and tuple(cur_w.shape) != tuple(w.shape):
            w = w.T
        if tuple(cur_w.shape) != tuple(w.shape) or tuple(cur_b.shape) != tuple(b.shape):
            self.mismatched.append(
                f"{w_name} -> {key}: ckpt {w.shape}/{b.shape} vs model "
                f"{tuple(cur_w.shape)}/{tuple(cur_b.shape)}"
            )
            return
        dst[key] = (
            jnp.asarray(w, dtype=cur_w.dtype),
            jnp.asarray(b, dtype=cur_b.dtype),
        )


def _import_talker(imp: _Importer, t: Dict, cfg: Qwen3TTSConfig):
    """Talker tensors (upstream `model.talker`, SURVEY §2.4)."""
    root = _find_prefix(imp.raw, "codec_head.weight", hint="talker") or "talker."
    m = root + "model."
    imp.put(t, "text_embed", f"{m}text_embedding.weight")
    imp.put(t, "codec_embed", f"{m}codec_embedding.weight")
    imp.put(t, "codec_head", f"{root}codec_head.weight", "lin")
    imp.put(t["text_proj"], "w", f"{root}text_projection.weight", "lin")
    imp.put(t["text_proj"], "b", f"{root}text_projection.bias")
    # x-vector -> talker hidden (the generate_speaker_prompt projection,
    # SURVEY §2.4); declared layout, prefix-detected like the rest.
    imp.put(t["spk_proj"], "w", f"{m}spk_projection.weight", "lin")
    imp.put(t["spk_proj"], "b", f"{m}spk_projection.bias")
    imp.put(t, "final_norm", f"{m}norm.weight")
    L = cfg.talker.num_hidden_layers
    for name, key in _TALKER_LAYER_MAP.items():
        tr = "lin" if key in _LINEAR_KEYS else None
        imp.put_stacked(t["layers"], key, [f"{m}layers.{i}.{name}" for i in range(L)], tr)


def _import_predictor(imp: _Importer, p: Dict, cfg: Qwen3TTSConfig):
    """Code-predictor tensors (upstream `talker.code_predictor`,
    reference predictor_graph.py:52-57)."""
    cp = _find_prefix(imp.raw, "small_to_mtp_projection.weight") or "talker.code_predictor."
    imp.put(p["mtp_proj"], "w", f"{cp}small_to_mtp_projection.weight", "lin")
    imp.put(p["mtp_proj"], "b", f"{cp}small_to_mtp_projection.bias")
    imp.put(p, "final_norm", f"{cp}model.norm.weight")
    Lp = cfg.predictor.num_hidden_layers
    for name, key in _TALKER_LAYER_MAP.items():
        tr = "lin" if key in _LINEAR_KEYS else None
        imp.put_stacked(p["layers"], key, [f"{cp}model.layers.{i}.{name}" for i in range(Lp)], tr)
    n = cfg.predictor.num_codebooks
    imp.put_stacked(p, "lm_heads", [f"{cp}lm_head.{i}.weight" for i in range(n)], "lin")
    imp.put_stacked(p, "codec_embeds", [f"{cp}model.codec_embedding.{i}.weight" for i in range(n)])


def _import_codec(imp: _Importer, c: Dict, cfg: Qwen3TTSConfig):
    """Code2Wav decoder tensors. Layout verified against the public
    transformers Qwen3OmniMoeCode2Wav module (same architecture family as
    the Qwen3-TTS 12Hz speech tokenizer the reference calls at
    model.py:918-924); the root prefix is detected, so
    `speech_tokenizer.model.decoder.` / `code2wav.` / flat all work."""
    d = _find_prefix(imp.raw, "code_embedding.weight", hint="2wav")
    if d is None:
        d = _find_prefix(imp.raw, "code_embedding.weight", hint="tokenizer") or "code2wav."
    imp.put(c, "code_embed", f"{d}code_embedding.weight")

    pt = c["pre_transformer"]
    imp.put(pt, "final_norm", f"{d}pre_transformer.norm.weight")
    Lc = cfg.codec.num_hidden_layers
    for name, key in _CODEC_LAYER_MAP.items():
        tr = "lin" if key in _CODEC_LINEAR_KEYS else None
        imp.put_stacked(
            pt["layers"], key,
            [f"{d}pre_transformer.layers.{i}.{name}" for i in range(Lc)], tr,
        )

    for j, stage in enumerate(c["upsample"]):
        imp.put(stage, "up_w", f"{d}upsample.{j}.0.conv.weight", "tconv")
        imp.put(stage, "up_b", f"{d}upsample.{j}.0.conv.bias")
        cn, base = stage["convnext"], f"{d}upsample.{j}.1."
        imp.put(cn, "dw_w", f"{base}dwconv.conv.weight", "conv")
        imp.put(cn, "dw_b", f"{base}dwconv.conv.bias")
        imp.put(cn, "ln_w", f"{base}norm.weight")
        imp.put(cn, "ln_b", f"{base}norm.bias")
        imp.put(cn, "pw1_w", f"{base}pwconv1.weight", "lin")
        imp.put(cn, "pw1_b", f"{base}pwconv1.bias")
        imp.put(cn, "pw2_w", f"{base}pwconv2.weight", "lin")
        imp.put(cn, "pw2_b", f"{base}pwconv2.bias")
        imp.put(cn, "gamma", f"{base}gamma")

    imp.put(c, "dec_in_w", f"{d}decoder.0.conv.weight", "conv")
    imp.put(c, "dec_in_b", f"{d}decoder.0.conv.bias")
    for i, blk in enumerate(c["blocks"]):
        base = f"{d}decoder.{i + 1}.block."
        imp.put(blk, "a", f"{base}0.alpha")
        imp.put(blk, "b", f"{base}0.beta")
        imp.put(blk, "up_w", f"{base}1.conv.weight", "tconv")
        imp.put(blk, "up_b", f"{base}1.conv.bias")
        for u, unit in enumerate(blk["units"]):
            ub = f"{base}{u + 2}."
            imp.put(unit, "a1", f"{ub}act1.alpha")
            imp.put(unit, "b1", f"{ub}act1.beta")
            imp.put(unit, "c1_w", f"{ub}conv1.conv.weight", "conv")
            imp.put(unit, "c1_b", f"{ub}conv1.conv.bias")
            imp.put(unit, "a2", f"{ub}act2.alpha")
            imp.put(unit, "b2", f"{ub}act2.beta")
            imp.put(unit, "c2_w", f"{ub}conv2.conv.weight", "conv")
            imp.put(unit, "c2_b", f"{ub}conv2.conv.bias")
    nb = len(cfg.codec.upsample_rates)
    imp.put(c, "out_a", f"{d}decoder.{nb + 1}.alpha")
    imp.put(c, "out_b", f"{d}decoder.{nb + 1}.beta")
    imp.put(c, "dec_out_w", f"{d}decoder.{nb + 2}.conv.weight", "conv")
    imp.put(c, "dec_out_b", f"{d}decoder.{nb + 2}.conv.bias")


def _put_tdnn(imp: _Importer, dst: Dict, base: str):
    """One public TimeDelayNetBlock: Conv1d weight + bias (no norm)."""
    imp.put(dst, "w", f"{base}.conv.weight", "conv")
    imp.put(dst, "b", f"{base}.conv.bias")


def _import_speaker_encoder(imp: _Importer, s: Dict, cfg: Qwen3TTSConfig):
    """ECAPA speaker encoder, tensor names of the PUBLIC Qwen module
    (transformers qwen2_5_omni ECAPA_TimeDelayNet — Qwen's own x-vector
    encoder; upstream qwen_tts produces the 2048-d ref_spk_embedding this
    feeds, reference README.md:500). Layout validated numerically against
    that torch class in tests/test_encoder_torch_parity.py: blocks.0 stem,
    SE-Res2Net blocks (se_block.conv1/conv2 k=1 convs), mfa, asp.tdnn +
    asp.conv attention, fc k=1 conv. `_find_prefix` accepts any root
    carrying those members ("spk_encoder." in qwen2_5_omni's DiT,
    "speaker_encoder." flat, ...)."""
    sc = cfg.speaker_encoder
    root = _find_prefix(imp.raw, "asp.tdnn.conv.weight", hint="spk") or "speaker_encoder."
    _put_tdnn(imp, s["in"], f"{root}blocks.0")
    for i in range(sc.num_blocks):
        blk = s[f"block{i}"]
        base = f"{root}blocks.{i + 1}"
        _put_tdnn(imp, blk["tdnn1"], f"{base}.tdnn1")
        for j in range(sc.res2net_scale - 1):
            _put_tdnn(imp, blk["res2"][j], f"{base}.res2net_block.blocks.{j}")
        _put_tdnn(imp, blk["tdnn2"], f"{base}.tdnn2")
        imp.put_pair(blk, "se1", (f"{base}.se_block.conv1.weight", f"{base}.se_block.conv1.bias"))
        imp.put_pair(blk, "se2", (f"{base}.se_block.conv2.weight", f"{base}.se_block.conv2.bias"))
    _put_tdnn(imp, s["mfa"], f"{root}mfa")
    _put_tdnn(imp, s["att_tdnn"], f"{root}asp.tdnn")
    imp.put_pair(s, "att_proj", (f"{root}asp.conv.weight", f"{root}asp.conv.bias"))
    imp.put_pair(s, "out", (f"{root}fc.weight", f"{root}fc.bias"))
    imp.put_pair(s, "out", (f"{root}fc.weight", f"{root}fc.bias"))


def _put_res_unit(imp: _Importer, unit: Dict, base: str):
    imp.put(unit, "a1", f"{base}act1.alpha")
    imp.put(unit, "b1", f"{base}act1.beta")
    imp.put(unit, "c1_w", f"{base}conv1.conv.weight", "conv")
    imp.put(unit, "c1_b", f"{base}conv1.conv.bias")
    imp.put(unit, "a2", f"{base}act2.alpha")
    imp.put(unit, "b2", f"{base}act2.beta")
    imp.put(unit, "c2_w", f"{base}conv2.conv.weight", "conv")
    imp.put(unit, "c2_b", f"{base}conv2.conv.bias")


def _put_convnext(imp: _Importer, cn: Dict, base: str):
    imp.put(cn, "dw_w", f"{base}dwconv.conv.weight", "conv")
    imp.put(cn, "dw_b", f"{base}dwconv.conv.bias")
    imp.put(cn, "ln_w", f"{base}norm.weight")
    imp.put(cn, "ln_b", f"{base}norm.bias")
    imp.put(cn, "pw1_w", f"{base}pwconv1.weight", "lin")
    imp.put(cn, "pw1_b", f"{base}pwconv1.bias")
    imp.put(cn, "pw2_w", f"{base}pwconv2.weight", "lin")
    imp.put(cn, "pw2_b", f"{base}pwconv2.bias")
    imp.put(cn, "gamma", f"{base}gamma")


def _import_codec_encoder(imp: _Importer, e: Dict, cfg: Qwen3TTSConfig):
    """Codec (speech-tokenizer) encoder: the structural mirror of the
    torch-validated Code2Wav decoder (models/voice_extract.encode_latents).
    Naming mirrors the decoder's export: encoder.N conv/block stack,
    downsample ConvNeXt stages, pre-quantizer sliding-window transformer."""
    ccfg = cfg.codec
    root = _find_prefix(imp.raw, "encoder.0.conv.weight", hint="encoder") or "speech_tokenizer.encoder."
    imp.put(e, "enc_in_w", f"{root}encoder.0.conv.weight", "conv")
    imp.put(e, "enc_in_b", f"{root}encoder.0.conv.bias")
    nb = len(ccfg.upsample_rates)
    for i in range(nb):
        blk = e["blocks"][i]
        base = f"{root}encoder.{i + 1}.block."
        for u in range(len(blk["units"])):
            _put_res_unit(imp, blk["units"][u], f"{base}{u}.")
        nu = len(blk["units"])
        imp.put(blk, "a", f"{base}{nu}.alpha")
        imp.put(blk, "b", f"{base}{nu}.beta")
        imp.put(blk, "down_w", f"{base}{nu + 1}.conv.weight", "conv")
        imp.put(blk, "down_b", f"{base}{nu + 1}.conv.bias")
    imp.put(e, "enc_mid_w", f"{root}encoder.{nb + 1}.conv.weight", "conv")
    imp.put(e, "enc_mid_b", f"{root}encoder.{nb + 1}.conv.bias")
    for j in range(len(ccfg.upsampling_ratios)):
        stage = e["downsample"][j]
        _put_convnext(imp, stage["convnext"], f"{root}downsample.{j}.0.")
        imp.put(stage, "down_w", f"{root}downsample.{j}.1.conv.weight", "conv")
        imp.put(stage, "down_b", f"{root}downsample.{j}.1.conv.bias")
    pt = e["pre_transformer"]
    imp.put(pt, "final_norm", f"{root}pre_transformer.norm.weight")
    for name, key in _CODEC_LAYER_MAP.items():
        tr = "lin" if key in _CODEC_LINEAR_KEYS else None
        imp.put_stacked(
            pt["layers"], key,
            [f"{root}pre_transformer.layers.{i}.{name}" for i in range(ccfg.num_hidden_layers)],
            tr,
        )


def load_hf_checkpoint(
    path: str,
    cfg: Qwen3TTSConfig,
    dtype=jnp.bfloat16,
    strict: bool = False,
    submodels: Optional[tuple] = None,
    device_put: bool = True,
) -> Dict[str, Any]:
    """Import an upstream HF Qwen3-TTS checkpoint directory.

    Maps EVERY submodel the engine runs: talker, code predictor, Code2Wav
    codec decoder, codec encoder, and speaker encoder (the reference gets all
    of these via `Qwen3TTSModel.from_pretrained`, reference model.py:187-197).

    strict=False: missing tensors keep their random init (logged) so a partial
    checkpoint still produces a runnable model for benchmarking.
    strict=True: raise StrictLoadError listing every missing/mismatched tensor
    and a sample of unconsumed checkpoint keys — a partially-mapped real
    checkpoint must never silently babble (VERDICT r1 weak #4).

    submodels: optional subset like ("talker", "predictor", "codec") — the
    returned dict then contains ONLY those submodels (nothing else is built).
    With the default (all five), the encoders are optional: a checkpoint with
    zero encoder tensors passes strict, because x-vector-only serving never
    runs them.
    """
    import logging

    import jax

    logger = logging.getLogger(__name__)
    raw = _RawStore(path)

    wanted = submodels if submodels is not None else (
        "talker", "predictor", "codec", "speaker_encoder", "codec_encoder"
    )
    optional = () if submodels is not None else ("speaker_encoder", "codec_encoder")

    # Sentinel skeleton instead of real random init (O(ms) at any geometry):
    # random leaves hold a scale-encoding sentinel, imported tensors replace
    # them, and whatever is STILL a sentinel afterwards is regenerated at its
    # recovered scale (_finalize). The old path host-initialized every
    # submodel at full geometry just to overwrite it — 519 s measured for a
    # tiny talker+predictor import, because the production-geometry codec and
    # codec-encoder random inits (pure single-core numpy) came along for the
    # ride; real-checkpoint cold loads paid the same minutes.
    params = _skeleton(cfg, dtype, wanted)
    # Keep every skeleton leaf alive for the whole import so no id() is
    # recycled onto an imported array (identity is how _finalize tells
    # "still the skeleton" apart from "imported" without device readbacks).
    skeleton_leaves = jax.tree_util.tree_leaves(params)
    skeleton_ids = {id(l) for l in skeleton_leaves}

    if not raw:
        if strict:
            raise StrictLoadError(f"no safetensors found under {path}")
        logger.warning("no safetensors found under %s; using random init", path)
        return _finalize(params, skeleton_ids, device_put)

    imp = _Importer(raw)

    # Per-submodel coverage (VERDICT r4 next #2): a real load's failure mode
    # must be a NAMED per-submodel diff, not a wall of unmapped keys — e.g.
    # "codec_encoder 0/121" immediately isolates the one declared-layout map.
    coverage: Dict[str, str] = {}

    def run(name, fn, *args):
        before_missing = len(imp.missing)
        before_used = len(imp.used)
        fn(*args)
        absent = False
        if name in optional and len(imp.missing) > before_missing:
            # Entire optional submodel absent from checkpoint: tolerated even
            # in strict mode, but only if NOTHING of it was present.
            new = imp.missing[before_missing:]
            if len(new) >= _leaf_count(name, cfg):
                del imp.missing[before_missing:]
                absent = True
                logger.info("checkpoint has no %s tensors; keeping random init", name)
        matched = len(imp.used) - before_used
        missed = len(imp.missing) - before_missing
        coverage[name] = (
            f"absent ({matched}/{matched + _leaf_count(name, cfg)})" if absent
            else f"{matched}/{matched + missed}"
        )

    if "talker" in wanted:
        run("talker", _import_talker, imp, params["talker"], cfg)
    if "predictor" in wanted:
        run("predictor", _import_predictor, imp, params["predictor"], cfg)
    if "codec" in wanted:
        run("codec", _import_codec, imp, params["codec"], cfg)
    if "speaker_encoder" in wanted:
        run("speaker_encoder", _import_speaker_encoder, imp, params["speaker_encoder"], cfg)
    if "codec_encoder" in wanted:
        run("codec_encoder", _import_codec_encoder, imp, params["codec_encoder"], cfg)

    cov_line = "Per-submodel coverage: " + ", ".join(
        f"{k} {v}" for k, v in coverage.items()
    )
    logger.info("%s", cov_line)
    if imp.missing or imp.mismatched:
        unconsumed = sorted(set(raw.keys()) - imp.used)
        msg = (
            f"checkpoint import incomplete: {len(imp.missing)} missing, "
            f"{len(imp.mismatched)} mismatched.\n{cov_line}"
            + "\nMissing (first 20): "
            + "\n  ".join(imp.missing[:20])
            + "\nMismatched: "
            + "\n  ".join(imp.mismatched[:20])
            + f"\nUnconsumed checkpoint keys ({len(unconsumed)}, first 20): "
            + "\n  ".join(unconsumed[:20])
        )
        if strict:
            err = StrictLoadError(msg)
            err.coverage = dict(coverage)
            raise err
        logger.warning("%s", msg)

    out = _finalize(params, skeleton_ids, device_put)
    del skeleton_leaves  # keepalive ends only after identity checks are done
    return out


def _skeleton(cfg: Qwen3TTSConfig, dtype, wanted) -> Dict[str, Any]:
    """Sentinel-filled parameter skeleton for the requested submodels.

    Same tree structure as the real inits; random leaves encode their init
    scale as (value / _INIT_SENTINEL), constant leaves (ones/zeros/fills)
    come out exact. Costs milliseconds regardless of geometry."""
    import jax

    from .models import voice_extract

    rng = _SentinelRng()
    sk: Dict[str, Any] = {}
    if "talker" in wanted:
        sk["talker"] = talker_lib.init_params(0, cfg.talker, dtype=dtype, rng=rng)
    if "predictor" in wanted:
        sk["predictor"] = predictor_lib.init_params(
            1000, cfg.predictor, cfg.talker.hidden_size, dtype=dtype, rng=rng
        )
    if "codec" in wanted:
        sk["codec"] = codec_lib.init_params(2000, cfg.codec, dtype=jnp.float32, rng=rng)
    if "speaker_encoder" in wanted:
        sk["speaker_encoder"] = voice_extract.init_speaker_params(
            7, cfg.speaker_encoder, rng=rng
        )
    if "codec_encoder" in wanted:
        sk["codec_encoder"] = voice_extract.init_encoder_params(8, cfg.codec, rng=rng)
    return jax.tree.map(np.asarray, sk)


def _finalize(params: Dict[str, Any], skeleton_ids: set, device_put_flag: bool,
              seed: int = 0) -> Dict[str, Any]:
    """Regenerate leaves still holding the init sentinel, then ship.

    device_put: regenerated leaves come from one jitted device-side RNG
    program (the init_all_device mechanism) and everything ships in one
    batched transfer; otherwise a host RNG fills them in place."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    regen = []  # (leaf index, shape, dtype, recovered scale)
    for i, leaf in enumerate(leaves):
        if id(leaf) not in skeleton_ids:
            continue  # imported tensor: never read back
        a = np.asarray(leaf)
        # NOTE: no dtype-kind gate — ml_dtypes bfloat16 reports kind 'V'.
        # The value test alone is decisive: only sentinel-filled leaves can
        # hold 0 < |x| < 1e-20 (integer/bool/ones/zero/const-fill leaves
        # can't, and real init scales are >= ~1e-3).
        v = float(abs(np.float32(a.flat[0]))) if a.size else 0.0
        if 0.0 < v < 1e-20:
            regen.append((i, a.shape, a.dtype, v / _INIT_SENTINEL))
    if regen:
        if device_put_flag:
            def _gen(key):
                ks = jax.random.split(key, len(regen))
                return [
                    (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)
                    for k, (_i, shape, dt, scale) in zip(ks, regen)
                ]

            # 'rbg' PRNG: counter-based hardware RNG path whose HLO is one
            # tiny op per leaf — the default threefry lowering for ~1e8-
            # element draws x150 leaves produces a program that erratic
            # remote compilers chew on for minutes. Init quality needs no
            # cryptographic stream.
            #
            # Routed through the AOT executable cache: the program's shapes
            # live in the `regen` CLOSURE (its only kwarg is the key), so the
            # geometry digest goes into the cache NAME — two different model
            # geometries must never share an entry.
            from .engine import aot

            geom = hashlib.sha256(repr(regen).encode()).hexdigest()[:16]
            generated = aot.call(
                f"init_all_device-{geom}", jax.jit(_gen),
                key=jax.random.key(seed, impl="rbg"),
            )
        else:
            host = np.random.default_rng(seed)
            generated = [
                (host.standard_normal(shape, dtype=np.float32) * scale).astype(dt)
                for (_i, shape, dt, scale) in regen
            ]
        for (i, *_), g in zip(regen, generated):
            leaves[i] = g
    if device_put_flag:
        leaves = jax.device_put(leaves)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _leaf_count(submodel: str, cfg: Qwen3TTSConfig) -> int:
    """Number of (w,b) leaves an encoder submodel maps (for the all-absent
    tolerance check in optional submodels)."""
    if submodel == "speaker_encoder":
        sc = cfg.speaker_encoder
        # each TDNN block is conv w+b (no norm in the public module)
        per_block = 2 + (sc.res2net_scale - 1) * 2 + 2 + 4  # tdnn1+res2+tdnn2+se
        return 2 + sc.num_blocks * per_block + 2 + 2 + 2 + 2  # stem+mfa+asp.tdnn+asp.conv+fc
    if submodel == "codec_encoder":
        ccfg = cfg.codec
        nb = len(ccfg.upsample_rates)
        per_block = 3 * 8 + 2 + 2  # units + snake + down conv
        per_stage = 9 + 2  # convnext + down conv
        transformer = 11 * ccfg.num_hidden_layers + 1
        return 2 + nb * per_block + 2 + len(ccfg.upsampling_ratios) * per_stage + transformer


def export_hf_layout(params: Dict[str, Any], cfg: Qwen3TTSConfig, path: str) -> None:
    """Write params back out in the UPSTREAM tensor layout (inverse of
    load_hf_checkpoint). Used by the round-trip import tests and for
    producing fixtures; float32 numpy safetensors."""
    from safetensors.numpy import save_file

    out: Dict[str, np.ndarray] = {}

    def rev(a, transform=None):
        a = np.asarray(a, np.float32)
        if transform == "lin":
            a = a.T
        elif transform == "conv":
            a = np.transpose(a, (2, 1, 0))
        elif transform == "tconv":
            a = np.transpose(a[::-1], (1, 2, 0))
        # safetensors serializes the raw buffer; transposed VIEWS would be
        # written with stale strides (silently wrong data).
        return np.ascontiguousarray(a)

    t = params["talker"]
    out["talker.codec_head.weight"] = rev(t["codec_head"], "lin")
    out["talker.text_projection.weight"] = rev(t["text_proj"]["w"], "lin")
    out["talker.text_projection.bias"] = rev(t["text_proj"]["b"])
    out["talker.model.text_embedding.weight"] = rev(t["text_embed"])
    out["talker.model.codec_embedding.weight"] = rev(t["codec_embed"])
    out["talker.model.spk_projection.weight"] = rev(t["spk_proj"]["w"], "lin")
    out["talker.model.spk_projection.bias"] = rev(t["spk_proj"]["b"])
    out["talker.model.norm.weight"] = rev(t["final_norm"])
    for name, key in _TALKER_LAYER_MAP.items():
        tr = "lin" if key in _LINEAR_KEYS else None
        for i in range(cfg.talker.num_hidden_layers):
            out[f"talker.model.layers.{i}.{name}"] = rev(t["layers"][key][i], tr)

    p = params["predictor"]
    cp = "talker.code_predictor."
    out[f"{cp}small_to_mtp_projection.weight"] = rev(p["mtp_proj"]["w"], "lin")
    out[f"{cp}small_to_mtp_projection.bias"] = rev(p["mtp_proj"]["b"])
    out[f"{cp}model.norm.weight"] = rev(p["final_norm"])
    for name, key in _TALKER_LAYER_MAP.items():
        tr = "lin" if key in _LINEAR_KEYS else None
        for i in range(cfg.predictor.num_hidden_layers):
            out[f"{cp}model.layers.{i}.{name}"] = rev(p["layers"][key][i], tr)
    for i in range(cfg.predictor.num_codebooks):
        out[f"{cp}lm_head.{i}.weight"] = rev(p["lm_heads"][i], "lin")
        out[f"{cp}model.codec_embedding.{i}.weight"] = rev(p["codec_embeds"][i])

    c = params["codec"]
    d = "speech_tokenizer.model.decoder."
    out[f"{d}code_embedding.weight"] = rev(c["code_embed"])
    out[f"{d}pre_transformer.norm.weight"] = rev(c["pre_transformer"]["final_norm"])
    for name, key in _CODEC_LAYER_MAP.items():
        tr = "lin" if key in _CODEC_LINEAR_KEYS else None
        for i in range(cfg.codec.num_hidden_layers):
            out[f"{d}pre_transformer.layers.{i}.{name}"] = rev(
                c["pre_transformer"]["layers"][key][i], tr
            )
    for j, stage in enumerate(c["upsample"]):
        out[f"{d}upsample.{j}.0.conv.weight"] = rev(stage["up_w"], "tconv")
        out[f"{d}upsample.{j}.0.conv.bias"] = rev(stage["up_b"])
        cn, base = stage["convnext"], f"{d}upsample.{j}.1."
        out[f"{base}dwconv.conv.weight"] = rev(cn["dw_w"], "conv")
        out[f"{base}dwconv.conv.bias"] = rev(cn["dw_b"])
        out[f"{base}norm.weight"] = rev(cn["ln_w"])
        out[f"{base}norm.bias"] = rev(cn["ln_b"])
        out[f"{base}pwconv1.weight"] = rev(cn["pw1_w"], "lin")
        out[f"{base}pwconv1.bias"] = rev(cn["pw1_b"])
        out[f"{base}pwconv2.weight"] = rev(cn["pw2_w"], "lin")
        out[f"{base}pwconv2.bias"] = rev(cn["pw2_b"])
        out[f"{base}gamma"] = rev(cn["gamma"])
    out[f"{d}decoder.0.conv.weight"] = rev(c["dec_in_w"], "conv")
    out[f"{d}decoder.0.conv.bias"] = rev(c["dec_in_b"])
    for i, blk in enumerate(c["blocks"]):
        base = f"{d}decoder.{i + 1}.block."
        out[f"{base}0.alpha"] = rev(blk["a"])
        out[f"{base}0.beta"] = rev(blk["b"])
        out[f"{base}1.conv.weight"] = rev(blk["up_w"], "tconv")
        out[f"{base}1.conv.bias"] = rev(blk["up_b"])
        for u, unit in enumerate(blk["units"]):
            ub = f"{base}{u + 2}."
            out[f"{ub}act1.alpha"] = rev(unit["a1"])
            out[f"{ub}act1.beta"] = rev(unit["b1"])
            out[f"{ub}conv1.conv.weight"] = rev(unit["c1_w"], "conv")
            out[f"{ub}conv1.conv.bias"] = rev(unit["c1_b"])
            out[f"{ub}act2.alpha"] = rev(unit["a2"])
            out[f"{ub}act2.beta"] = rev(unit["b2"])
            out[f"{ub}conv2.conv.weight"] = rev(unit["c2_w"], "conv")
            out[f"{ub}conv2.conv.bias"] = rev(unit["c2_b"])
    nb = len(cfg.codec.upsample_rates)
    out[f"{d}decoder.{nb + 1}.alpha"] = rev(c["out_a"])
    out[f"{d}decoder.{nb + 1}.beta"] = rev(c["out_b"])
    out[f"{d}decoder.{nb + 2}.conv.weight"] = rev(c["dec_out_w"], "conv")
    out[f"{d}decoder.{nb + 2}.conv.bias"] = rev(c["dec_out_b"])

    if "speaker_encoder" in params:
        s = params["speaker_encoder"]
        root = "speaker_encoder."

        def tdnn(td, base):
            out[f"{base}.conv.weight"] = rev(td["w"], "conv")
            out[f"{base}.conv.bias"] = rev(td["b"])

        def pair_as_conv1(t, base):
            # this framework's linear [in, out] -> torch k=1 Conv1d [out, in, 1]
            w, b = t
            out[f"{base}.weight"] = rev(w, "lin")[:, :, None]
            out[f"{base}.bias"] = rev(b)

        tdnn(s["in"], f"{root}blocks.0")
        for i in range(cfg.speaker_encoder.num_blocks):
            blk = s[f"block{i}"]
            base = f"{root}blocks.{i + 1}"
            tdnn(blk["tdnn1"], f"{base}.tdnn1")
            for j, td in enumerate(blk["res2"]):
                tdnn(td, f"{base}.res2net_block.blocks.{j}")
            tdnn(blk["tdnn2"], f"{base}.tdnn2")
            pair_as_conv1(blk["se1"], f"{base}.se_block.conv1")
            pair_as_conv1(blk["se2"], f"{base}.se_block.conv2")
        tdnn(s["mfa"], f"{root}mfa")
        tdnn(s["att_tdnn"], f"{root}asp.tdnn")
        pair_as_conv1(s["att_proj"], f"{root}asp.conv")
        pair_as_conv1(s["out"], f"{root}fc")

    if "codec_encoder" in params:
        e = params["codec_encoder"]
        root = "speech_tokenizer.encoder."

        def res_unit(unit, base):
            out[f"{base}act1.alpha"] = rev(unit["a1"])
            out[f"{base}act1.beta"] = rev(unit["b1"])
            out[f"{base}conv1.conv.weight"] = rev(unit["c1_w"], "conv")
            out[f"{base}conv1.conv.bias"] = rev(unit["c1_b"])
            out[f"{base}act2.alpha"] = rev(unit["a2"])
            out[f"{base}act2.beta"] = rev(unit["b2"])
            out[f"{base}conv2.conv.weight"] = rev(unit["c2_w"], "conv")
            out[f"{base}conv2.conv.bias"] = rev(unit["c2_b"])

        out[f"{root}encoder.0.conv.weight"] = rev(e["enc_in_w"], "conv")
        out[f"{root}encoder.0.conv.bias"] = rev(e["enc_in_b"])
        nb = len(cfg.codec.upsample_rates)
        for i in range(nb):
            blk = e["blocks"][i]
            base = f"{root}encoder.{i + 1}.block."
            for u, unit in enumerate(blk["units"]):
                res_unit(unit, f"{base}{u}.")
            nu = len(blk["units"])
            out[f"{base}{nu}.alpha"] = rev(blk["a"])
            out[f"{base}{nu}.beta"] = rev(blk["b"])
            out[f"{base}{nu + 1}.conv.weight"] = rev(blk["down_w"], "conv")
            out[f"{base}{nu + 1}.conv.bias"] = rev(blk["down_b"])
        out[f"{root}encoder.{nb + 1}.conv.weight"] = rev(e["enc_mid_w"], "conv")
        out[f"{root}encoder.{nb + 1}.conv.bias"] = rev(e["enc_mid_b"])
        for j, stage in enumerate(e["downsample"]):
            cn, base = stage["convnext"], f"{root}downsample.{j}.0."
            out[f"{base}dwconv.conv.weight"] = rev(cn["dw_w"], "conv")
            out[f"{base}dwconv.conv.bias"] = rev(cn["dw_b"])
            out[f"{base}norm.weight"] = rev(cn["ln_w"])
            out[f"{base}norm.bias"] = rev(cn["ln_b"])
            out[f"{base}pwconv1.weight"] = rev(cn["pw1_w"], "lin")
            out[f"{base}pwconv1.bias"] = rev(cn["pw1_b"])
            out[f"{base}pwconv2.weight"] = rev(cn["pw2_w"], "lin")
            out[f"{base}pwconv2.bias"] = rev(cn["pw2_b"])
            out[f"{base}gamma"] = rev(cn["gamma"])
            out[f"{root}downsample.{j}.1.conv.weight"] = rev(stage["down_w"], "conv")
            out[f"{root}downsample.{j}.1.conv.bias"] = rev(stage["down_b"])
        pt = e["pre_transformer"]
        out[f"{root}pre_transformer.norm.weight"] = rev(pt["final_norm"])
        for name, key in _CODEC_LAYER_MAP.items():
            tr = "lin" if key in _CODEC_LINEAR_KEYS else None
            for i in range(cfg.codec.num_hidden_layers):
                out[f"{root}pre_transformer.layers.{i}.{name}"] = rev(pt["layers"][key][i], tr)

    os.makedirs(path, exist_ok=True)
    save_file(out, os.path.join(path, "model.safetensors"))
