"""FasterQwen3TTS: the public TPU inference API.

Same public surface as the reference's `FasterQwen3TTS` (reference
model.py:22-1505): `from_pretrained`, `warmup`, six generate methods
(voice-clone / custom-voice / voice-design, each non-streaming + streaming),
`speech_tokenizer`, `sample_rate` — implemented over the JAX/XLA engine
instead of CUDA graphs, and owning the full model stack (weights, tokenizer,
prompt assembly, codec) instead of wrapping an upstream package.

Key differences by design (TPU-first):
- `warmup()` AOT-compiles the jitted prefill/decode/codec executables for the
  bucketed shape set (the analog of CUDA-graph capture, reference
  model.py:239-256); everything afterwards is cached-executable dispatch.
- The decode loop never syncs the host per frame; chunked fused scans return
  token blocks at exactly the streaming-chunk granularity.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from pathlib import Path
from typing import Any, Dict, Generator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import Qwen3TTSConfig, get_config
from .engine import generate as gen_lib
from .models import codec as codec_lib
from .prompt import PromptBuilder
from .utils import audio as audio_lib
from .utils.tokenizer import PromptTokenizer, load_tokenizer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class VoiceClonePromptItem:
    """One reference-voice prompt item (the create_voice_clone_prompt output
    contract: reference model.py:429-451, README 'precomputed prompts')."""

    ref_spk_embedding: np.ndarray  # [2048] x-vector
    ref_code: Optional[np.ndarray] = None  # [T, 16] codec tokens (ICL only)
    icl_mode: bool = False
    x_vector_only_mode: bool = True
    ref_text: str = ""


class SpeechTokenizerFacade:
    """Codec decode surface matching `speech_tokenizer.decode({"audio_codes"})`
    (reference model.py:918-924)."""

    def __init__(self, params, cfg: Qwen3TTSConfig):
        self._params = params
        self._cfg = cfg
        self.sample_rate = cfg.codec.sample_rate

    def decode(self, inputs: Dict[str, Any]) -> Tuple[List[np.ndarray], int]:
        codes = np.asarray(inputs["audio_codes"])
        if codes.ndim == 2:
            codes = codes[None]
        B, T, Q = codes.shape
        outs = []
        for b in range(B):
            outs.append(self._decode_one(codes[b]))
        return outs, self.sample_rate

    def _decode_one(self, codes: np.ndarray) -> np.ndarray:
        T = codes.shape[0]
        cfg = self._cfg.codec
        # Exact-length output of the decoder geometry for T frames:
        exact = self._exact_len(T)
        # EVERY decode is padded to a power-of-two frame bucket by repeating
        # the last frame, then cut to the exact unpadded length. The decoder
        # is causal, so earlier samples are unaffected; only the ~2-frame
        # lookahead tail sees the repeated padding (acoustically continuous).
        # Rationale: each fresh codec shape costs a full XLA compile — this
        # caps the compile count at a handful of buckets for ANY workload.
        bucket = 32
        while bucket < T:
            bucket *= 2
        if bucket > T:
            codes = np.concatenate([codes, np.tile(codes[-1:], (bucket - T, 1))], axis=0)
        from .engine import aot

        wav = aot.call(
            "decode_frames",
            codec_lib.decode_frames_jit,
            params=self._params["codec"],
            cfg=cfg,
            codes=jnp.asarray(codes[None], jnp.int32),
        )
        # fetch-then-slice (eager device indexing = a one-off program)
        return np.asarray(wav, np.float32)[0, :exact]

    def _exact_len(self, T: int) -> int:
        cfg = self._cfg.codec
        n = T
        for r in cfg.upsampling_ratios:
            n *= r
        for r in cfg.upsample_rates:
            n = (n - 1) * r
        return n


class _StreamVocoder:
    """Per-stream incremental host vocoder for batched streaming.

    Encapsulates the host-decode regimes of `_stream_decode` (reference
    model.py:1046-1137): accumulated decode with ICL ref-code prepend until
    24 context frames exist (phase 1), then a fixed 24-frame-left-context
    window decode emitting window-local samples (phase 2, sample-exact by
    construction). One instance per batch slot keeps its own code history
    and emitted-sample count."""

    _CTX = gen_lib.CONTEXT_FRAMES

    def __init__(self, speech_tokenizer, codec_cfg, ref_codes: Optional[np.ndarray]):
        from .engine.fused_stream import codec_deficit

        self._st = speech_tokenizer
        self._up = codec_cfg.total_upsample
        self._deficit = codec_deficit(codec_cfg)
        self._ref_codes = ref_codes
        self._codes: List[np.ndarray] = []
        self._prev_len = 0  # samples emitted, generated-audio coordinates

    def vocode_new(self, frames: np.ndarray) -> np.ndarray:
        """Vocode `frames` [n, 16] new codec frames -> new audio samples."""
        self._codes.append(np.asarray(frames, np.int32))
        all_flat = np.concatenate(self._codes, axis=0)
        n_new = frames.shape[0]
        n_total = all_flat.shape[0]
        ctx, up, D = self._CTX, self._up, self._deficit
        if n_total - n_new >= ctx:
            window = all_flat[-(ctx + n_new):]
            audio_list, _sr = self._st.decode({"audio_codes": window[None]})
            audio = np.asarray(audio_list[0]).flatten()
            new_audio = audio[ctx * up - D : (ctx + n_new) * up - D]
            self._prev_len += len(new_audio)
            return new_audio
        codes_in = (
            np.concatenate([self._ref_codes, all_flat], axis=0)
            if self._ref_codes is not None
            else all_flat
        )
        audio_list, _sr = self._st.decode({"audio_codes": codes_in[None]})
        audio = np.asarray(audio_list[0]).flatten()
        if self._ref_codes is not None:
            cut = int(self._ref_codes.shape[0] / max(codes_in.shape[0], 1) * len(audio))
            gen_audio = audio[cut:]
        else:
            gen_audio = audio
        new_audio = gen_audio[self._prev_len:]
        self._prev_len = len(gen_audio)
        return new_audio


class FasterQwen3TTS:
    """TPU-native Qwen3-TTS engine with the reference-compatible public API."""

    def __init__(
        self,
        params: Dict[str, Any],
        config: Qwen3TTSConfig,
        tokenizer: PromptTokenizer,
        max_seq_len: int = 2048,
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.max_seq_len = max_seq_len
        self.dtype = dtype
        # Multi-chip (dp, tp) device mesh, or None for single-chip serving.
        # Set via from_pretrained(dp=, tp=); weights are already sharded.
        self.mesh = mesh
        self.sample_rate = config.codec.sample_rate
        self.prompt_builder = PromptBuilder(params, config)
        self._speech_tokenizer = SpeechTokenizerFacade(params, config)
        self._warmed_up = False
        self._voice_prompt_cache: Dict[Any, Any] = {}
        self._voice_extractor = None
        # frames per fused device dispatch in non-streaming generation
        self.device_chunk = 32

    # ------------------------------------------------------------------ init

    @classmethod
    def from_pretrained(
        cls,
        model_name: str,
        device: str = "tpu",
        dtype: Union[str, Any] = "bfloat16",
        attn_implementation: str = "pallas",
        max_seq_len: int = 2048,
        backend: str = "jax",
        quant: str = "BF16",
        seed: int = 0,
        cache_dir: Optional[Union[str, Path]] = None,
        local_files_only: bool = False,
        strict: Optional[bool] = None,
        dp: Optional[int] = None,
        tp: Optional[int] = None,
        **kwargs,
    ) -> "FasterQwen3TTS":
        """Load (or random-init) a model bundle and build the engine.

        model_name: HF-style id (resolved to a size/type preset), a directory
        with this framework's checkpoint (model.safetensors + config.json), or
        a directory with upstream HF safetensors.
        backend: "jax" (default). "native" routes host pre/post-processing
        through the C++ runtime (see native_backend.py).
        quant: "BF16" (default) or "Q8_0"/"int8" — weight-only int8 for the
        talker+predictor matmuls (halves decode HBM traffic; the reference's
        GGML quant surface, cli.py:357).
        dp / tp: multi-chip serving over a jax.sharding.Mesh (the TPU-native
        extension; the reference serializes requests behind a mutex, SURVEY
        §2.3). tp shards attention heads / MLP columns Megatron-style for
        per-request latency (tp must divide num_key_value_heads); dp shards
        the engine batch for multi-stream serving (use the batched streaming
        API / server --batch mode to feed it). Requires dp*tp visible
        devices.
        """
        if backend in ("native",):
            from .native_backend import NativeQwen3TTS

            return NativeQwen3TTS.from_pretrained(
                model_name, max_seq_len=max_seq_len, dtype=dtype, seed=seed, **kwargs
            )
        if backend not in ("jax", "tpu", "xla"):
            raise ValueError(
                f"Unsupported backend {backend!r}. Expected 'jax' (default) or 'native'."
            )
        if isinstance(dtype, str):
            dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16, "fp32": jnp.float32,
                     "float32": jnp.float32, "fp16": jnp.bfloat16}[dtype]
        if attn_implementation not in ("pallas", "xla"):
            raise ValueError("attn_implementation must be 'pallas' or 'xla'")
        if attn_implementation == "xla":
            os.environ["FQ3T_DISABLE_PALLAS"] = "1"

        from . import weights as weights_lib
        from .engine import aot as aot_lib

        load_phases: Dict[str, float] = {}
        _load_last = [time.perf_counter()]

        def mark_load(name: str) -> None:
            now = time.perf_counter()
            load_phases[name] = round(now - _load_last[0], 2)
            _load_last[0] = now

        # Warm-restart overlap: executable-cache loads are pure server RPCs,
        # so they run concurrently with the HOST-side weight work below
        # (checkpoint read, quantization). Joined BEFORE the first device op —
        # a transfer/fetch concurrent with load RPCs wedges tunneled clients
        # (round-4 forensics, BENCH_NOTES.md) — and skipped entirely in
        # device-init benchmark mode, whose init programs dispatch eagerly.
        use_device_init = (
            not os.path.isdir(model_name)
            and os.environ.get("FQ3T_DEVICE_INIT", "0") == "1"
        )
        preload_fut = None
        if not use_device_init and aot_lib.cache_dir():
            import concurrent.futures

            _pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
            preload_fut = _pool.submit(aot_lib.preload)
            _pool.shutdown(wait=False)

        bundle_mode = bundle_blobs = bundle_manifest = None
        if os.path.isdir(model_name) and weights_lib.is_deploy_bundle(model_name):
            # Deploy bundle: one file read here; the device transfer + unpack
            # happen AFTER the executable-preload join below (a transfer
            # flush racing load RPCs is the round-4 wedge class), attributed
            # to the device_transfer phase. The serving-grade restart path.
            bundle_blobs, bundle_manifest, config, bundle_mode = (
                weights_lib.read_deploy_bundle(model_name)
            )
            params = None
            load_phases["transfer_mb"] = round(
                sum(b.nbytes for b in bundle_blobs.values()) / 1e6, 1
            )
            tok = PromptTokenizer(load_tokenizer(model_name))
            from .utils.tokenizer import ByteTokenizer

            if isinstance(tok.base, ByteTokenizer):
                # A production bundle must carry its tokenizer
                # (save_deploy_bundle copies the assets); byte-tokenizing a
                # real checkpoint silently produces garbage speech.
                logger.warning(
                    "deploy bundle %s has no tokenizer assets "
                    "(tokenizer.json/vocab.json); falling back to the BYTE "
                    "tokenizer — fine for random-init benchmarks, wrong for "
                    "real checkpoints. Re-create the bundle with "
                    "model.save_deploy_bundle / the `bundle` CLI, or copy "
                    "the tokenizer files in.", model_name,
                )
        elif os.path.isdir(model_name) and weights_lib.is_own_checkpoint(model_name):
            params, config = weights_lib.load_pretrained(model_name)
            tok = PromptTokenizer(load_tokenizer(model_name))
        else:
            config = get_config(model_name)
            if os.path.isdir(model_name):
                # A directory of real HF safetensors defaults to strict=True:
                # StrictLoadError on any unmapped tensor, because a
                # partially-mapped real checkpoint must never silently babble
                # with random fallbacks (weights.py doctrine; VERDICT r3 weak
                # #2). Pass strict=False explicitly to tolerate gaps.
                params = weights_lib.load_hf_checkpoint(
                    model_name, config, dtype=dtype,
                    strict=(True if strict is None else strict),
                    device_put=False,
                )
                tok = PromptTokenizer(load_tokenizer(model_name))
            else:
                logger.warning(
                    "No local checkpoint for %s; using random-initialized weights "
                    "(benchmark/test mode).",
                    model_name,
                )
                if os.environ.get("FQ3T_DEVICE_INIT", "0") == "1":
                    # Generate weights directly in HBM: skips minutes of
                    # single-core host RNG + the multi-GB transfer (see
                    # weights.init_all_device). Benchmarks opt in; tests and
                    # golden fixtures keep the seeded host init.
                    params = weights_lib.init_all_device(config, seed=seed, dtype=dtype)
                else:
                    params = weights_lib.init_all(
                        config, seed=seed, dtype=dtype, device_put=False
                    )
                tok = PromptTokenizer(load_tokenizer(None))
        mark_load("weights_read")

        from .ops import quant as quant_lib

        mode = quant_lib.resolve_quant_name(quant)
        quantize_after_unpack = None
        if bundle_mode is not None and bundle_mode != "none":
            # The bundle ships pre-quantized weights; re-quantizing int8 is
            # both wasteful and lossy, so a conflicting request is an error.
            if mode not in ("none", bundle_mode):
                raise ValueError(
                    f"deploy bundle is quantized as {bundle_mode!r}; "
                    f"requested quant={quant!r} conflicts"
                )
        elif mode != "none":
            if bundle_mode is not None:
                # Unquantized bundle + quant request: params aren't resident
                # yet (the unpack runs after the preload join below), so
                # quantize there, device-side.
                quantize_after_unpack = mode
            else:
                params = quant_lib.quantize_model_params(params, mode)
        mark_load("quantize")

        mesh = None
        if dp is not None or tp is not None:
            from .parallel import mesh as mesh_lib

            dp_, tp_ = dp or 1, tp or 1
            n = dp_ * tp_
            if len(jax.devices()) < n:
                raise ValueError(
                    f"dp={dp_} x tp={tp_} needs {n} devices; only "
                    f"{len(jax.devices())} visible"
                )
            kv = config.talker.num_key_value_heads
            if kv % tp_ != 0 or config.predictor.num_key_value_heads % tp_ != 0:
                raise ValueError(f"tp={tp_} must divide num_key_value_heads")
            mesh = mesh_lib.make_mesh(n, dp=dp_, tp=tp_)

        if os.environ.get("FQ3T_FUSE_QKV", "0") == "1":
            if mesh is not None or bundle_blobs is not None:
                logger.warning(
                    "FQ3T_FUSE_QKV is a single-chip host-layout pass; ignored "
                    "under a (dp, tp) mesh or a deploy bundle (bundles ship "
                    "their saved layout)."
                )
            else:
                # Fused QKV / gate-up projections (single-chip layout; TP
                # sharding needs the per-head splits, quant.fuse_layer_weights)
                params = quant_lib.fuse_layer_weights(params)
        if preload_fut is not None:
            # Join the executable preload BEFORE the weight transfer: no two
            # RPC classes in flight at once (see overlap note above).
            load_phases["preloaded_executables"] = preload_fut.result()
            mark_load("aot_preload_join")
        if bundle_blobs is not None:
            # Foreground-flushed transfer + AOT-cached unpack (weights.py
            # _device_unpack): bandwidth-bound on the host<->device link.
            params = weights_lib._device_unpack(bundle_blobs, bundle_manifest)
            del bundle_blobs
            if quantize_after_unpack is not None:
                params = quant_lib.quantize_model_params(
                    params, quantize_after_unpack
                )
        if mesh is not None:
            from .parallel import mesh as mesh_lib

            params = mesh_lib.shard_params(params, mesh)
        elif bundle_mode is None:
            leaves = jax.tree_util.tree_leaves(params)
            if any(isinstance(l, jax.Array) for l in leaves):
                # device-init / already-resident tree: nothing to ship
                params = jax.device_put(params)
            else:
                # ONE packed transfer for the whole tree: per-leaf transfers
                # cost ~0.35 s of RPC latency EACH through tunneled runtimes
                # (188 leaves = minutes), while packed blobs stream at link
                # bandwidth; leaves are re-sliced on device in one jitted
                # program (weights.pack_transfer, foreground-flushed).
                params = weights_lib.pack_transfer(params)
        mark_load("device_transfer")
        model = cls(params, config, tok, max_seq_len=max_seq_len, dtype=dtype, mesh=mesh)
        model.load_phases = load_phases
        # Remembered so save_deploy_bundle can copy tokenizer assets over.
        model._source_path = model_name if os.path.isdir(model_name) else None
        return model

    def save_deploy_bundle(self, path: str, compact_f32: bool = True) -> None:
        """Persist this model's parameters — in their CURRENT (possibly
        quantized) form — as a deploy bundle, so a serving restart via
        ``from_pretrained(path)`` costs one file read -> one packed device
        transfer -> one AOT-cached unpack program, skipping safetensors
        name-mapping and host quantization entirely
        (weights.save_deploy_bundle). compact_f32 stores float32 sections
        as bfloat16 on disk/transfer and upcasts on device — lossless when
        the source checkpoint is bf16, as real Qwen3-TTS HF checkpoints
        are."""
        from . import weights as weights_lib
        from .ops import quant as quant_lib

        host = jax.device_get(self.params)
        weights_lib.save_deploy_bundle(
            path, host, self.config,
            quant_mode=quant_lib.infer_quant_mode(host),
            compact_f32=compact_f32,
        )
        # The bundle must be loadable standalone: copy tokenizer assets from
        # the source checkpoint, or the restart would silently fall back to
        # the byte tokenizer and produce garbage speech on real checkpoints.
        import shutil

        src = getattr(self, "_source_path", None)
        copied = 0
        if src and os.path.isdir(src):
            for f in ("tokenizer.json", "tokenizer_config.json", "vocab.json",
                      "merges.txt", "special_tokens_map.json"):
                p = os.path.join(src, f)
                if os.path.exists(p):
                    shutil.copy2(p, os.path.join(path, f))
                    copied += 1
        if copied == 0:
            logger.warning(
                "save_deploy_bundle(%s): no tokenizer assets found to copy "
                "(source: %r) — from_pretrained on this bundle will use the "
                "byte tokenizer (benchmark mode only).", path, src,
            )

    # ---------------------------------------------------------------- warmup

    def warmup(self, prefill_len: int = 100, chunk_sizes=None, first_chunk_size=None) -> None:
        """AOT-compile the hot executables (the CUDA-graph-capture analog,
        reference model.py:239-256). Idempotent.

        The trailing-text array is built at the STATIC tth bucket
        (engine.generate.tth_bucket), so the compiled decode/fused executables
        serve every text length up to the cap — no silent recompiles on the
        first real request. prefill executables are per prompt bucket; pass
        the expected prompt length to precompile the right one.
        """
        if self._warmed_up:
            return
        logger.info("Warming up jitted executables...")
        t0 = time.perf_counter()
        from .engine import aot

        # Machine-readable phase breakdown (VERDICT r4 next #1): every entry
        # is seconds spent in that phase; cold_start.py publishes the dict.
        self.warmup_phases: Dict[str, float] = {}
        _last = [t0]

        def mark(name: str) -> None:
            now = time.perf_counter()
            self.warmup_phases[name] = round(now - _last[0], 2)
            _last[0] = now
            logger.info("warmup: %s (%.1fs)", name, now - t0)

        # Block between dispatches only when a compile or disk-load actually
        # happened since the last checkpoint: preloaded executables pipeline
        # back-to-back on the device (in-order per-device execution) and one
        # final drain settles them — per-step fetches through a tunneled
        # runtime cost ~0.5-1 s EACH and dominated warm-restart warmup
        # (12 s of dispatches in BENCH_r04). With compiles in flight we keep
        # the blocking fetch after each step (serialize remote compiles; also
        # surfaces a broken cache entry at its own step, not at the drain).
        _settle_seen = [aot.STATS["compiles"] + aot.STATS["disk_loads"]]

        def settle(x) -> None:
            c = aot.STATS["compiles"] + aot.STATS["disk_loads"]
            if c != _settle_seen[0] or aot.cache_dir() is None:
                np.asarray(x)
                _settle_seen[0] = c

        # Drain the async load pipeline (device-side init / quantization /
        # weight transfer) with one tiny MAIN-thread fetch before anything
        # else. Ordering is load-bearing on tunneled runtimes: a fetch
        # in flight concurrently with executable-load RPCs reliably wedges
        # this environment's client (measured 132 s with a watcher-thread
        # fetch during the parallel preload, and 993 s when the drain fetch
        # followed it — vs 6.9 s for the identical fetch with nothing else
        # in flight; round-4 forensics in BENCH_NOTES.md). Drain first,
        # THEN preload, then dispatch: no two RPC classes ever overlap.
        # Also gives honest phase attribution — load-pipeline time no
        # longer hides inside the first warmup step.
        leaves = jax.tree.leaves(self.params["talker"])
        small = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
        np.asarray(small)
        mark("load_pipeline_drain")
        n_pre = aot.preload()  # warm restart: overlap the executable loads
        if n_pre:
            logger.info("warmup: %d AOT executables preloaded", n_pre)
        self.warmup_phases["preloaded_executables"] = n_pre
        mark("aot_preload")
        H = self.config.talker.hidden_size
        bucket = gen_lib.prefill_bucket(prefill_len, self.max_seq_len)
        tie = np.zeros((1, bucket, H), np.float32)
        mask = np.ones((1, bucket), np.int32)
        tth = np.zeros((1, gen_lib.tth_bucket(1), H), np.float32)
        tpe = np.zeros((1, 1, H), np.float32)
        from .ops.sampling import SamplingParams

        sess = gen_lib.GenerationSession(
            self.params, self.config, tie, mask, tth, tpe, self.max_seq_len,
            SamplingParams(), SamplingParams(), 2, seed=0, dtype=self.dtype,
        )
        mark("session_ready")
        sess.prefill(block=False)
        settle(sess.state.token)
        mark("prefill")
        if chunk_sizes is None:
            chunk_sizes = (8, 12, self.device_chunk)
            fused_chunks = (8, 12)  # streaming sizes; device_chunk is non-streaming
        else:
            fused_chunks = tuple(chunk_sizes)
        for chunk in dict.fromkeys(chunk_sizes):
            settle(sess.decode_chunk_async(chunk))
            mark(f"decode_chunk_{chunk}")
        if os.environ.get("FQ3T_FUSED_VOCODE", "1") != "0":
            # Fused decode+vocode executables (the TTFA/steady-state path):
            # one per (chunk size, window ctx) with ctx growing
            # min(k*chunk, 24) — non-ICL streams never touch the host codec.
            max_ctx = gen_lib.CONTEXT_FRAMES
            ncg = self.config.talker.num_code_groups
            for chunk in dict.fromkeys(fused_chunks):
                first = first_chunk_size or chunk
                settle(sess.decode_chunk_fused_async(first, 0))
                mark(f"fused_{first}_ctx0")
                # ctx schedule the driver will hit: totals first, first+chunk,
                # ... capped at the steady-state window. Iterate until the cap
                # is reached — a fixed k range misses max_ctx for small chunk
                # sizes (ADVICE r2: chunk=4 would warm only ctx {4,8,12,16})
                ctxs, k = [], 0
                while True:
                    ctx = min(first + k * chunk, max_ctx)
                    if not ctxs or ctx != ctxs[-1]:
                        ctxs.append(ctx)
                    if ctx >= max_ctx:
                        break
                    k += 1
                for ctx in ctxs:
                    sess.set_codec_history(np.zeros((max_ctx, ncg), np.int32), ctx)
                    flat = sess.decode_chunk_fused_async(chunk, ctx)
                    settle(flat)  # block only around real compiles
                    mark(f"fused_{chunk}_ctx{ctx}")
                if first != chunk:
                    # ICL-fused chunk 0: (first_chunk_size, full window) — the
                    # reference tail is the window, so the very first ICL
                    # dispatch uses this executable (engine ref_codes path).
                    sess.set_codec_history(np.zeros((max_ctx, ncg), np.int32), max_ctx)
                    settle(sess.decode_chunk_fused_async(first, max_ctx))
                    mark(f"fused_{first}_ctx{max_ctx}")
        else:
            # Host codec bucket (regime-2 accumulated decode, first buckets).
            self._speech_tokenizer.decode(
                {"audio_codes": np.zeros((1, 32, self.config.talker.num_code_groups), np.int32)}
            )
        # Prompt-assembly jits (text-hidden buckets, codec-id embeds, x-vector
        # projection): each is a separate executable that would otherwise
        # compile silently inside the first real request.
        self.prompt_builder.specials()
        self.prompt_builder.speaker_embed_from_xvector(np.zeros(2048, np.float32))
        mark("specials_and_xvec_jits")
        warm_text = "The quick brown fox jumps over the lazy dog warms buckets."
        warm_prompt = {
            "ref_spk_embedding": [np.zeros(2048, np.float32)],
            "x_vector_only_mode": [True], "icl_mode": [False], "ref_code": [None],
        }
        self._prepare_generation(
            warm_text, language="English", voice_clone_prompt=warm_prompt, xvec_only=True
        )
        # Host builder too (batch/nsm/parity paths): its text-hidden bucket
        # executables no longer compile via the device-assembly request above.
        self._prepare_generation(
            warm_text, language="English", voice_clone_prompt=warm_prompt,
            xvec_only=True, prefer_device=False,
        )
        mark("prompt_assembly_jits")
        # ICL device-assembly executables (_icl_block_jit + the icl=True
        # streaming assembly): without this, the FIRST real ICL request
        # compiles them inline — minutes through a remote compiler when the
        # AOT disk cache is cold (ADVICE r4 #2). 90 reference frames is the
        # serving-representative length (bench.py ICL section); other ref
        # lengths in the same pow2 bucket reuse these executables.
        icl_rng = np.random.default_rng(0)
        icl_prompt = {
            "ref_spk_embedding": [np.zeros(2048, np.float32)],
            "x_vector_only_mode": [False], "icl_mode": [True],
            "ref_code": [icl_rng.integers(
                0, self.config.talker.vocab_size - 1025, size=(90, self.config.talker.num_code_groups)
            ).astype(np.int32)],
        }
        self._prepare_generation(
            warm_text, language="English", ref_text="warmup reference text",
            voice_clone_prompt=icl_prompt, xvec_only=False,
        )
        mark("icl_prompt_assembly_jits")
        # Final drain: pipelined (unsettled) warmup dispatches all execute
        # in-order on the device; one fetch settles the lot.
        np.asarray(sess.state.token)
        mark("final_drain")
        # Keep the warmup session's device buffers alive: releasing them here
        # fires a burst of buffer-delete RPCs exactly as the first real
        # request dispatches, which reproducibly wedges this environment's
        # tunneled TPU client (first fused fetch never returns). On direct
        # TPU runtimes this only costs one idle KV cache until shutdown.
        self._warm_sess = sess
        self._warmed_up = True
        logger.info("Warmup complete in %.1fs", time.perf_counter() - t0)

    def _warmup(self, prefill_len: int) -> None:
        self.warmup(prefill_len=prefill_len)

    # ------------------------------------------------------ continuous batch

    def _make_stream_vocoder(self, ref_codes: Optional[np.ndarray]) -> "_StreamVocoder":
        return _StreamVocoder(self._speech_tokenizer, self.config.codec, ref_codes)

    def continuous_batcher(self, **kwargs):
        """A ContinuousBatcher over this model: requests join a RUNNING
        batch at chunk boundaries instead of lockstep prefills (serving.py;
        the admission-control serving mode)."""
        from .serving import ContinuousBatcher

        return ContinuousBatcher(self, **kwargs)

    # -------------------------------------------------------------- plumbing

    @property
    def speech_tokenizer(self) -> SpeechTokenizerFacade:
        return self._speech_tokenizer

    @staticmethod
    def _resolve_non_streaming_mode(non_streaming_mode: Optional[bool], *, default: bool) -> bool:
        """None -> the method-specific upstream default (clone False,
        custom/design True — reference model.py:84-91)."""
        return default if non_streaming_mode is None else non_streaming_mode

    def generate(self, *args, **kwargs):
        raise NotImplementedError(
            "Default voice generation not implemented. Use generate_voice_clone(), "
            "generate_custom_voice(), or generate_voice_design()."
        )

    def create_voice_clone_prompt(
        self,
        ref_audio: Union[str, Path, Tuple[np.ndarray, int]],
        ref_text: str = "",
        x_vector_only_mode: bool = False,
    ) -> List[VoiceClonePromptItem]:
        """Extract a voice-clone prompt from reference audio.

        Runs the speaker (x-vector) encoder and, for ICL mode, the codec
        encoder (reference call surface: model.py:429-451)."""
        if isinstance(ref_audio, (str, Path)):
            audio, sr = audio_lib.read_wav(ref_audio)
        else:
            audio, sr = ref_audio
            audio = np.asarray(audio, np.float32)
        extractor = self._get_voice_extractor()
        xvec = extractor.extract_xvector(audio, sr)
        if x_vector_only_mode:
            return [
                VoiceClonePromptItem(
                    ref_spk_embedding=xvec, icl_mode=False, x_vector_only_mode=True,
                    ref_text="",
                )
            ]
        ref_code = extractor.extract_codes(audio, sr)
        return [
            VoiceClonePromptItem(
                ref_spk_embedding=xvec, ref_code=ref_code, icl_mode=True,
                x_vector_only_mode=False, ref_text=ref_text,
            )
        ]

    def _get_voice_extractor(self):
        if self._voice_extractor is None:
            from .models.voice_extract import VoiceExtractor

            self._voice_extractor = VoiceExtractor(self.params, self.config)
        return self._voice_extractor

    def _prompt_items_to_voice_clone_prompt(self, items: List[VoiceClonePromptItem]) -> Dict[str, Any]:
        return dict(
            ref_code=[i.ref_code for i in items],
            ref_spk_embedding=[i.ref_spk_embedding for i in items],
            x_vector_only_mode=[bool(i.x_vector_only_mode) for i in items],
            icl_mode=[bool(i.icl_mode) for i in items],
        )

    # -- voice-clone prompt resolution (reference model.py:295-463) ----------

    def _resolve_voice_clone_prompt(
        self, input_ids, ref_audio, ref_text, xvec_only, append_silence, voice_clone_prompt
    ):
        if voice_clone_prompt is not None:
            return self._resolve_precomputed(input_ids, ref_text, voice_clone_prompt)
        if ref_audio is None:
            raise ValueError("ref_audio is required when voice_clone_prompt is not provided")
        return self._resolve_from_reference(
            input_ids, ref_audio, ref_text, xvec_only, append_silence
        )

    def _resolve_precomputed(self, input_ids, ref_text, voice_clone_prompt):
        n = len(input_ids)
        if isinstance(voice_clone_prompt, list):
            if len(voice_clone_prompt) != n:
                raise ValueError(
                    f"voice_clone_prompt must have length {n}, got {len(voice_clone_prompt)}"
                )
            vcp = self._prompt_items_to_voice_clone_prompt(voice_clone_prompt)
            ref_ids = []
            for item in voice_clone_prompt:
                if bool(item.icl_mode):
                    item_text = item.ref_text or ref_text
                    if not item_text:
                        raise ValueError("ref_text is required when voice_clone_prompt uses ICL mode.")
                    ref_ids.append(self.tokenizer.ref_ids(item_text))
                else:
                    ref_ids.append(None)
            return vcp, ref_ids, any(vcp["icl_mode"])

        if "ref_spk_embedding" not in voice_clone_prompt:
            raise ValueError(
                "voice_clone_prompt missing required keys: ['ref_spk_embedding']. "
                "Expected keys: ['ref_spk_embedding']"
            )
        for key in ("ref_spk_embedding", "x_vector_only_mode", "icl_mode", "ref_code"):
            if key in voice_clone_prompt:
                v = voice_clone_prompt[key]
                if not isinstance(v, list) or len(v) != n:
                    raise ValueError(
                        f"voice_clone_prompt[{key!r}] must be a list with length {n}"
                    )
        xvec_modes = voice_clone_prompt.get("x_vector_only_mode", [True] * n)
        if "icl_mode" in voice_clone_prompt:
            icl_modes = [bool(v) for v in voice_clone_prompt["icl_mode"]]
            for i, (xm, im) in enumerate(zip(xvec_modes, icl_modes)):
                if bool(xm) == bool(im):
                    raise ValueError(
                        f"voice_clone_prompt has inconsistent mode flags at index {i}: "
                        "x_vector_only_mode and icl_mode must be opposites"
                    )
        else:
            icl_modes = [not bool(v) for v in xvec_modes]
        ref_codes = voice_clone_prompt.get("ref_code", [None] * n)
        for i, (xm, im, rc) in enumerate(zip(xvec_modes, icl_modes, ref_codes)):
            if bool(xm) and rc is not None:
                raise ValueError(
                    f"voice_clone_prompt index {i}: ref_code must be None in x_vector_only mode"
                )
            if bool(im) and rc is None:
                raise ValueError(f"voice_clone_prompt index {i}: ref_code is required in ICL mode")
        vcp = dict(
            ref_code=ref_codes,
            ref_spk_embedding=voice_clone_prompt["ref_spk_embedding"],
            x_vector_only_mode=[bool(v) for v in xvec_modes],
            icl_mode=icl_modes,
        )
        using_icl = any(icl_modes)
        if using_icl:
            if not ref_text:
                raise ValueError("ref_text is required when voice_clone_prompt uses ICL mode.")
            rid = self.tokenizer.ref_ids(ref_text)
            ref_ids = [rid if im else None for im in icl_modes]
        else:
            ref_ids = [None] * n
        return vcp, ref_ids, using_icl

    def _resolve_from_reference(self, input_ids, ref_audio, ref_text, xvec_only, append_silence):
        using_icl = not xvec_only
        cache_key = (str(ref_audio), ref_text, xvec_only, append_silence)
        if cache_key in self._voice_prompt_cache:
            vcp, ref_ids = self._voice_prompt_cache[cache_key]
            return vcp, ref_ids, using_icl
        if xvec_only:
            items = self.create_voice_clone_prompt(
                str(ref_audio), ref_text="", x_vector_only_mode=True
            )
            vcp = self._prompt_items_to_voice_clone_prompt(items)
            ref_ids = [None] * len(input_ids)
        else:
            silence = 0.5 if append_silence else 0.0
            audio, sr = audio_lib.load_ref_audio(ref_audio, silence_secs=silence)
            items = self.create_voice_clone_prompt((audio, sr), ref_text=ref_text)
            vcp = self._prompt_items_to_voice_clone_prompt(items)
            rt = items[0].ref_text
            ref_ids = [self.tokenizer.ref_ids(rt) if rt else None]
        self._voice_prompt_cache[cache_key] = (vcp, ref_ids)
        return vcp, ref_ids, using_icl

    # -- shared preparation (reference model.py:465-581) ---------------------

    def _prepare_generation(
        self,
        text: str,
        ref_audio=None,
        ref_text: str = "",
        language: str = "English",
        xvec_only: bool = False,
        non_streaming_mode: bool = False,
        append_silence: bool = True,
        voice_clone_prompt=None,
        instruct: Optional[str] = None,
        prefer_device: bool = True,
    ):
        input_ids = [self.tokenizer.assistant_ids(text)]
        instruct_ids = [self.tokenizer.instruct_ids(instruct)] if instruct else [None]
        vcp, ref_ids, using_icl = self._resolve_voice_clone_prompt(
            input_ids, ref_audio, ref_text, xvec_only, append_silence, voice_clone_prompt
        )
        if instruct and not using_icl:
            logger.warning(
                "Base-model instruct with x-vector-only voice cloning is experimental; "
                "prefer xvec_only=False (ICL mode)."
            )
        languages = [language] if language is not None else ["Auto"]
        ref_codes = None
        if using_icl and vcp.get("ref_code") and vcp["ref_code"][0] is not None:
            ref_codes = np.asarray(vcp["ref_code"][0], np.int32)
        if self._device_prompt_ok(prefer_device, non_streaming_mode):
            dev = self.prompt_builder.build_device(
                input_ids, ref_ids, vcp, languages, None, instruct_ids, self.max_seq_len
            )
            if dev is not None:
                tie, tam, tth, tpe = dev
                return tie, tam, tth, tpe, ref_codes
        tie, tam, tth, tpe = self.prompt_builder.build(
            input_ids=input_ids,
            ref_ids=ref_ids,
            voice_clone_prompt=vcp,
            languages=languages,
            speakers=None,
            non_streaming_mode=non_streaming_mode,
            instruct_ids=instruct_ids,
        )
        return tie, tam, tth, tpe, ref_codes

    def _device_prompt_ok(self, prefer_device: bool, non_streaming_mode: bool) -> bool:
        """Device-side prompt assembly gate: single-stream streaming-layout
        requests on a single chip (the TTFA path). The batch scheduler re-pads
        prompts in host numpy, the parity engine indexes them eagerly, and the
        mesh path re-commits with shardings — those keep the host builder.
        FQ3T_DEVICE_PROMPT=0 forces the host path everywhere (A/B lever)."""
        return (
            prefer_device
            and not non_streaming_mode
            and self.mesh is None
            and os.environ.get("FQ3T_DEVICE_PROMPT", "1") != "0"
        )

    def _prepare_generation_custom(
        self, text, language, speaker, instruct=None, non_streaming_mode=True,
        prefer_device: bool = True,
    ):
        input_ids = [self.tokenizer.assistant_ids(text)]
        instruct_ids = [self.tokenizer.instruct_ids(instruct)] if instruct else [None]
        languages = [language] if language is not None else ["Auto"]
        if self._device_prompt_ok(prefer_device, non_streaming_mode):
            dev = self.prompt_builder.build_device(
                input_ids, [None], None, languages, [speaker], instruct_ids,
                self.max_seq_len,
            )
            if dev is not None:
                return dev
        tie, tam, tth, tpe = self.prompt_builder.build(
            input_ids=input_ids,
            ref_ids=[None],
            voice_clone_prompt=None,
            languages=languages,
            speakers=[speaker],
            non_streaming_mode=non_streaming_mode,
            instruct_ids=instruct_ids,
        )
        return tie, tam, tth, tpe

    # -- validation helpers (reference _validate_languages/_validate_speakers)

    def _validate_languages(self, languages: List[str]) -> None:
        for lang in languages:
            if lang is None:
                continue
            k = lang.lower()
            if k != "auto" and k not in self.config.talker.codec_language_id:
                raise NotImplementedError(f"Language {lang} not implemented")

    def _validate_speakers(self, speakers: List[str]) -> None:
        for s in speakers:
            if s and s.lower() not in self.config.talker.spk_id:
                raise NotImplementedError(f"Speaker {s} not implemented")

    def get_supported_speakers(self) -> List[str]:
        return sorted(self.config.talker.spk_id.keys())

    @property
    def tts_model_type(self) -> str:
        return self.config.model_type

    @property
    def tts_model_size(self) -> str:
        return self.config.model_size

    # -- codec decode helpers -------------------------------------------------

    def _decode_audio(self, codec_ids: np.ndarray, ref_codes: Optional[np.ndarray]):
        """Full-sequence codec decode with ICL ref-code prepend + trim
        (reference model.py:917-938)."""
        if ref_codes is not None:
            codes = np.concatenate([ref_codes, codec_ids], axis=0)
        else:
            codes = codec_ids
        audio_list, sr = self._speech_tokenizer.decode({"audio_codes": codes[None]})
        ref_len = ref_codes.shape[0] if ref_codes is not None else 0
        total = codes.shape[0]
        outs = []
        for a in audio_list:
            a = np.asarray(a).flatten()
            if ref_len > 0:
                cut = int(ref_len / max(total, 1) * len(a))
                a = a[cut:]
            outs.append(a)
        return outs, sr

    def _log_rtf(self, timing: Dict[str, Any]) -> None:
        steps = timing["steps"]
        audio_s = steps / self.config.frame_rate
        total = timing["prefill_ms"] / 1000 + timing["decode_s"]
        rtf = audio_s / total if total > 0 else 0
        logger.info(
            "Generated %.2fs audio in %.2fs (%.1fms/step, RTF: %.2f)",
            audio_s, total, timing["ms_per_step"], rtf,
        )

    # ------------------------------------------------------------- generate*

    @staticmethod
    def _reject_native_cached_reference_args(
        ref_spk=None, ref_rvq=None, ref_spk_emb=None, ref_codes=None
    ) -> None:
        """Cached-reference kwargs are native-backend-only; the jax backend
        accepts them in the signature and rejects them at call time, the same
        accept-and-reject contract the reference's torch backend applies to
        its GGML-only kwargs (reference model.py:93-104, 825-873)."""
        if any(v is not None for v in (ref_spk, ref_rvq, ref_spk_emb, ref_codes)):
            raise NotImplementedError(
                "ref_spk/ref_rvq cached references require backend='native'. "
                "Use voice_clone_prompt for precomputed prompts with the jax backend."
            )

    def generate_voice_clone(
        self,
        text: str,
        language: str,
        ref_audio: Optional[Union[str, Path]] = None,
        ref_text: str = "",
        max_new_tokens: int = 2048,
        min_new_tokens: int = 2,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        do_sample: bool = True,
        repetition_penalty: float = 1.05,
        xvec_only: bool = False,
        non_streaming_mode: Optional[bool] = None,
        append_silence: bool = True,
        parity_mode: bool = False,
        instruct: Optional[str] = None,
        ref_spk: Optional[Union[str, Path]] = None,
        ref_rvq: Optional[Union[str, Path]] = None,
        ref_spk_emb: Optional[np.ndarray] = None,
        ref_codes: Optional[np.ndarray] = None,
        voice_clone_prompt=None,
        seed: Optional[int] = None,
    ) -> Tuple[List[np.ndarray], int]:
        """Voice-clone TTS -> ([waveform], sample_rate). Mirrors reference
        model.py:807-950. ref_spk/ref_rvq/ref_spk_emb/ref_codes are
        native-backend cached-reference fields, rejected here (reference
        model.py:868-873).

        parity_mode: independent eager per-step decode instead of the fused
        engine — the reference exposes the same knob on its non-streaming
        path (reference generate.py:52-97, `fast_generate(parity_mode=True)`
        routing through upstream `talker.generate`)."""
        self._reject_native_cached_reference_args(ref_spk, ref_rvq, ref_spk_emb, ref_codes)
        nsm = self._resolve_non_streaming_mode(non_streaming_mode, default=False)
        tie, tam, tth, tpe, ref_codes = self._prepare_generation(
            text=text, language=language, ref_audio=ref_audio, ref_text=ref_text,
            xvec_only=xvec_only, non_streaming_mode=nsm, append_silence=append_silence,
            voice_clone_prompt=voice_clone_prompt, instruct=instruct,
            prefer_device=not parity_mode,
        )
        if parity_mode:
            from .engine import parity as parity_lib

            codec_ids, timing = parity_lib.parity_generate(
                self.params, self.config, tie, tam, tth, tpe,
                max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
                min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
                top_p=top_p, do_sample=do_sample,
                repetition_penalty=repetition_penalty, seed=seed,
            )
        else:
            codec_ids, timing = gen_lib.fast_generate(
                self.params, self.config, tie, tam, tth, tpe,
                max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
                min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
                top_p=top_p, do_sample=do_sample, repetition_penalty=repetition_penalty,
                seed=seed, device_chunk=self.device_chunk,
            )
        if codec_ids is None:
            logger.warning("Generation returned no tokens")
            return [np.zeros(1, np.float32)], self.sample_rate
        audio, sr = self._decode_audio(codec_ids, ref_codes)
        self._log_rtf(timing)
        return audio, sr

    def generate_voice_clone_streaming(
        self,
        text: str,
        language: str,
        ref_audio: Optional[Union[str, Path]] = None,
        ref_text: str = "",
        max_new_tokens: int = 2048,
        min_new_tokens: int = 2,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        do_sample: bool = True,
        repetition_penalty: float = 1.05,
        chunk_size: int = 12,
        first_chunk_size: Optional[int] = None,
        xvec_only: bool = False,
        non_streaming_mode: Optional[bool] = None,
        append_silence: bool = True,
        parity_mode: bool = False,
        instruct: Optional[str] = None,
        ref_spk: Optional[Union[str, Path]] = None,
        ref_rvq: Optional[Union[str, Path]] = None,
        ref_spk_emb: Optional[np.ndarray] = None,
        ref_codes: Optional[np.ndarray] = None,
        voice_clone_prompt=None,
        seed: Optional[int] = None,
        subtalker_dosample: Optional[bool] = None,
        subtalker_top_k: Optional[int] = None,
        subtalker_top_p: Optional[float] = None,
        subtalker_temperature: Optional[float] = None,
    ) -> Generator[Tuple[np.ndarray, int, Dict[str, Any]], None, None]:
        """Streaming voice clone: yields (audio_chunk, sample_rate, timing).
        Mirrors reference model.py:952-1137 including the hybrid codec decode
        (accumulate -> calibrate samples_per_frame -> 25-frame window).

        subtalker_*: code-predictor sampling overrides. The reference freezes
        these at graph capture (reference model.py:209-218); here they are
        per-call static args of the jitted step, so the public API can expose
        them (None keeps the reference defaults: sample, top_k 50, temp 0.9)."""
        self._reject_native_cached_reference_args(ref_spk, ref_rvq, ref_spk_emb, ref_codes)
        nsm = self._resolve_non_streaming_mode(non_streaming_mode, default=False)
        tie, tam, tth, tpe, ref_codes = self._prepare_generation(
            text=text, language=language, ref_audio=ref_audio, ref_text=ref_text,
            xvec_only=xvec_only, non_streaming_mode=nsm, append_silence=append_silence,
            voice_clone_prompt=voice_clone_prompt, instruct=instruct,
            prefer_device=not parity_mode,
        )
        if parity_mode:
            # Parity path: a genuinely independent per-step eager fp32 decode
            # sharing only weights/config/sampling with the fused engine —
            # the role the reference's dynamic-cache parity path plays
            # (reference streaming.py:191-359).
            from .engine import parity as parity_lib

            stream = parity_lib.parity_generate_streaming(
                self.params, self.config, tie, tam, tth, tpe,
                max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
                min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
                top_p=top_p, do_sample=do_sample, repetition_penalty=repetition_penalty,
                chunk_size=chunk_size, seed=seed, first_chunk_size=first_chunk_size,
                subtalker_dosample=subtalker_dosample, subtalker_top_k=subtalker_top_k,
                subtalker_top_p=subtalker_top_p, subtalker_temperature=subtalker_temperature,
            )
            stream = ((f, None, t) for f, t in stream)
        else:
            stream = gen_lib.fast_generate_streaming_fused(
                self.params, self.config, tie, tam, tth, tpe,
                max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
                min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
                top_p=top_p, do_sample=do_sample, repetition_penalty=repetition_penalty,
                chunk_size=chunk_size, seed=seed, first_chunk_size=first_chunk_size,
                subtalker_dosample=subtalker_dosample, subtalker_top_k=subtalker_top_k,
                subtalker_top_p=subtalker_top_p, subtalker_temperature=subtalker_temperature,
                # The ctx=0 fused first chunk is the TTFA path (audio comes
                # out of the same device program as the tokens, one fetch).
                # ICL with >=24 reference frames fuses too (the ref tail is
                # the vocoder window from chunk 0 — engine ref_codes path);
                # only SHORT references keep the host prepend-and-trim path
                # (reference model.py:919-923).
                fuse_first_chunk=ref_codes is None,
                ref_codes=ref_codes,
            )
        yield from self._stream_decode(stream, chunk_size, ref_codes)

    def generate_voice_clone_streaming_batch(
        self,
        requests: List[Dict[str, Any]],
        chunk_size: int = 8,
        first_chunk_size: Optional[int] = None,
        max_new_tokens: int = 2048,
        min_new_tokens: int = 2,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        do_sample: bool = True,
        repetition_penalty: float = 1.05,
        seed: Optional[int] = None,
        subtalker_dosample: Optional[bool] = None,
        subtalker_top_k: Optional[int] = None,
        subtalker_top_p: Optional[float] = None,
        subtalker_temperature: Optional[float] = None,
    ) -> Generator[Tuple[int, np.ndarray, int, Dict[str, Any]], None, None]:
        """Batched multi-request streaming: B independent voice-clone streams
        decoded in lockstep on ONE engine batch (sharded over the dp mesh
        axis when the model was loaded with from_pretrained(dp=...)).

        requests: list of dicts, each with the generate_voice_clone_streaming
        prompt fields: text (required), language, ref_audio, ref_text,
        xvec_only, voice_clone_prompt, instruct, append_silence,
        non_streaming_mode. Sampling/chunk kwargs are shared by the batch
        (they are compile-time constants of the shared executable).

        Yields (slot_index, audio_chunk float32, sample_rate, timing) in
        chunk order; a slot stops appearing once its stream hit EOS. This is
        the serving mode the reference lacks (requests behind a mutex,
        reference openai_server.py:71) — the TPU-native batched extension.

        Vocoding is device-side whenever the batch is uniform (all slots
        xvec-only, or all slots carrying >= 24 ICL reference frames): the
        B-lane windowed vocode fuses into the decode executable, so each
        chunk is ONE dispatch + ONE fetch for the whole batch instead of B
        sequential host codec decodes (engine.fast_generate_streaming_batch).
        Mixed/short-reference batches fall back to per-slot host vocoders.
        first_chunk_size: smaller first chunk = lower per-slot TTFA, same
        semantics as generate_voice_clone_streaming.
        """
        if not requests:
            return
        prepared = []
        for r in requests:
            nsm = self._resolve_non_streaming_mode(r.get("non_streaming_mode"), default=False)
            prepared.append(
                self._prepare_generation(
                    text=r["text"],
                    language=r.get("language", "English"),
                    ref_audio=r.get("ref_audio"),
                    ref_text=r.get("ref_text", ""),
                    xvec_only=bool(r.get("xvec_only", False)),
                    non_streaming_mode=nsm,
                    append_silence=bool(r.get("append_silence", True)),
                    voice_clone_prompt=r.get("voice_clone_prompt"),
                    instruct=r.get("instruct"),
                    # the batch scheduler re-pads slots in host numpy below
                    prefer_device=False,
                )
            )
        B = len(prepared)
        H = self.config.talker.hidden_size
        Pmax = max(p[0].shape[1] for p in prepared)
        bucket = gen_lib.prefill_bucket(Pmax, self.max_seq_len)
        tie = np.zeros((B, bucket, H), np.float32)
        mask = np.zeros((B, bucket), np.int32)
        Tmax = max(p[2].shape[1] for p in prepared)
        tbucket = gen_lib.tth_bucket(Tmax)
        tth = np.zeros((B, tbucket, H), np.float32)
        tpe = np.asarray(prepared[0][3], np.float32)  # model-constant pad embed
        ref_codes: List[Optional[np.ndarray]] = []
        for s, (tie_s, tam_s, tth_s, tpe_s, rc) in enumerate(prepared):
            P = tie_s.shape[1]
            tie[s, bucket - P :] = np.asarray(tie_s[0], np.float32)
            mask[s, bucket - P :] = np.asarray(tam_s[0], np.int32)
            tth[s] = gen_lib._pad_trailing(
                np.asarray(tth_s, np.float32), tpe_s, tbucket
            )[0]
            ref_codes.append(rc)

        stream = gen_lib.fast_generate_streaming_batch(
            self.params, self.config, tie, mask, tth, tpe,
            max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
            min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
            top_p=top_p, do_sample=do_sample, repetition_penalty=repetition_penalty,
            chunk_size=chunk_size, first_chunk_size=first_chunk_size, seed=seed,
            mesh=self.mesh, ref_codes_list=ref_codes,
            subtalker_dosample=subtalker_dosample, subtalker_top_k=subtalker_top_k,
            subtalker_top_p=subtalker_top_p, subtalker_temperature=subtalker_temperature,
        )
        # Host vocoders only materialize on the non-fused path (mixed or
        # short-reference batches); fused chunks carry device-decoded audio.
        from .engine.fused_stream import codec_deficit

        vocoders: Optional[List[_StreamVocoder]] = None
        up = self.config.codec.total_upsample
        D = codec_deficit(self.config.codec)
        emitted_done = [False] * B
        for frames, valid, done, audio_b, timing in stream:
            for s in range(B):
                if emitted_done[s]:
                    continue
                v = int(valid[:, s].sum())
                if v:
                    if audio_b is not None:
                        n_emit = max(v * up - D, 0) if timing["first_window"] else v * up
                        audio = np.asarray(audio_b[s, :n_emit], np.float32)
                    else:
                        if vocoders is None:
                            vocoders = [
                                _StreamVocoder(self._speech_tokenizer, self.config.codec, rc)
                                for rc in ref_codes
                            ]
                        audio = vocoders[s].vocode_new(frames[valid[:, s], s])
                    t = dict(timing)
                    t["slot"] = s
                    t["chunk_steps"] = v
                    t["total_steps_so_far"] = int(timing["total_steps_so_far"][s])
                    t["is_final"] = bool(done[s]) or bool(timing["is_final"])
                    yield s, audio, self.sample_rate, t
                if done[s]:
                    emitted_done[s] = True

    def _stream_decode(self, stream, chunk_size: int, ref_codes: Optional[np.ndarray]):
        """Streaming vocoder with three regimes (reference model.py:1046-1137):
        1. fused chunks: audio already decoded on device (opt-in,
           engine/fused_stream.py);
        2. early/ICL chunks: accumulated host decode through the bucketed
           codec facade (reference phase 1);
        3. steady state: fixed 24-frame-left-context window decode, emitting
           window-local samples [ctx*up - D : (ctx+new)*up - D) — sample-exact
           contiguity by construction (vs the reference's empirical
           samples_per_frame calibration, model.py:1108-1114)."""
        import concurrent.futures

        from .engine.fused_stream import codec_deficit

        ctx = gen_lib.CONTEXT_FRAMES
        up = self.config.codec.total_upsample
        D = codec_deficit(self.config.codec)
        all_codes: List[np.ndarray] = []
        state = {"prev_len": 0}  # samples emitted, generated-audio coordinates

        def vocode(all_flat: np.ndarray, n_new: int) -> np.ndarray:
            """Host vocode of one chunk (runs on the worker thread)."""
            n_total = all_flat.shape[0]
            if n_total - n_new >= ctx:
                # regime 3: fixed-context window (always the same codec bucket)
                window = all_flat[-(ctx + n_new):]
                audio_list, _sr = self._speech_tokenizer.decode({"audio_codes": window[None]})
                audio = np.asarray(audio_list[0]).flatten()
                new_audio = audio[ctx * up - D : (ctx + n_new) * up - D]
                state["prev_len"] += len(new_audio)
                return new_audio
            # regime 2: accumulated decode (with ICL ref-code prepend)
            codes_in = (
                np.concatenate([ref_codes, all_flat], axis=0)
                if ref_codes is not None
                else all_flat
            )
            audio_list, _sr = self._speech_tokenizer.decode({"audio_codes": codes_in[None]})
            audio = np.asarray(audio_list[0]).flatten()
            if ref_codes is not None:
                cut = int(ref_codes.shape[0] / max(codes_in.shape[0], 1) * len(audio))
                gen_audio = audio[cut:]
            else:
                gen_audio = audio
            new_audio = gen_audio[state["prev_len"]:]
            state["prev_len"] = len(gen_audio)
            return new_audio

        # The vocode runs on a single worker thread so its device round trips
        # overlap the (blocking) fetch of the NEXT token chunk; the first
        # chunk is vocoded inline to keep it on the TTFA critical path only.
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        pending = None  # (future_or_audio, timing)
        try:
            for codec_chunk, fused_audio, timing in stream:
                all_codes.append(codec_chunk)
                if fused_audio is not None:
                    if pending is not None:
                        fut, t0 = pending
                        pending = None
                        yield fut.result(), self.sample_rate, t0
                    state["prev_len"] += len(fused_audio)
                    yield fused_audio, self.sample_rate, timing
                    continue
                all_flat = np.concatenate(all_codes, axis=0)
                n_new = codec_chunk.shape[0]
                if pending is None and timing["chunk_index"] == 0:
                    yield vocode(all_flat, n_new), self.sample_rate, timing
                    continue
                fut = pool.submit(vocode, all_flat, n_new)
                if pending is not None:
                    prev_fut, t0 = pending
                    yield prev_fut.result(), self.sample_rate, t0
                pending = (fut, timing)
            if pending is not None:
                fut, t0 = pending
                yield fut.result(), self.sample_rate, t0
        finally:
            pool.shutdown(wait=False)

    def generate_custom_voice(
        self,
        text: str,
        speaker: str,
        language: str,
        instruct: Optional[str] = None,
        non_streaming_mode: Optional[bool] = None,
        max_new_tokens: int = 2048,
        min_new_tokens: int = 2,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        do_sample: bool = True,
        repetition_penalty: float = 1.05,
        seed: Optional[int] = None,
    ) -> Tuple[List[np.ndarray], int]:
        """CustomVoice TTS (reference model.py:1139-1221)."""
        if self.tts_model_type != "custom_voice":
            raise ValueError("Loaded model does not support custom voice generation")
        self._validate_languages([language])
        self._validate_speakers([speaker])
        nsm = self._resolve_non_streaming_mode(non_streaming_mode, default=True)
        if self.tts_model_size in "0b6":
            instruct = None
        tie, tam, tth, tpe = self._prepare_generation_custom(
            text, language, speaker, instruct=instruct, non_streaming_mode=nsm
        )
        codec_ids, timing = gen_lib.fast_generate(
            self.params, self.config, tie, tam, tth, tpe,
            max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
            min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
            top_p=top_p, do_sample=do_sample, repetition_penalty=repetition_penalty,
            seed=seed, device_chunk=self.device_chunk,
        )
        if codec_ids is None:
            logger.warning("Generation returned no tokens")
            return [np.zeros(1, np.float32)], self.sample_rate
        audio, sr = self._decode_audio(codec_ids, None)
        self._log_rtf(timing)
        return audio, sr

    def generate_custom_voice_streaming(
        self,
        text: str,
        speaker: str,
        language: str,
        instruct: Optional[str] = None,
        non_streaming_mode: Optional[bool] = None,
        max_new_tokens: int = 2048,
        min_new_tokens: int = 2,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        do_sample: bool = True,
        repetition_penalty: float = 1.05,
        chunk_size: int = 12,
        first_chunk_size: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Generator[Tuple[np.ndarray, int, Dict[str, Any]], None, None]:
        if self.tts_model_type != "custom_voice":
            raise ValueError("Loaded model does not support custom voice generation")
        self._validate_languages([language])
        self._validate_speakers([speaker])
        nsm = self._resolve_non_streaming_mode(non_streaming_mode, default=True)
        if self.tts_model_size in "0b6":
            instruct = None
        tie, tam, tth, tpe = self._prepare_generation_custom(
            text, language, speaker, instruct=instruct, non_streaming_mode=nsm
        )
        stream = gen_lib.fast_generate_streaming_fused(
            self.params, self.config, tie, tam, tth, tpe,
            max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
            min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
            top_p=top_p, do_sample=do_sample, repetition_penalty=repetition_penalty,
            chunk_size=chunk_size, seed=seed, fuse_first_chunk=True,
            first_chunk_size=first_chunk_size,
        )
        yield from self._stream_decode(stream, chunk_size, None)

    def generate_voice_design(
        self,
        text: str,
        instruct: str,
        language: str,
        non_streaming_mode: Optional[bool] = None,
        max_new_tokens: int = 2048,
        min_new_tokens: int = 2,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        do_sample: bool = True,
        repetition_penalty: float = 1.05,
        seed: Optional[int] = None,
    ) -> Tuple[List[np.ndarray], int]:
        """VoiceDesign TTS (reference model.py:1328-1405)."""
        if self.tts_model_type != "voice_design":
            raise ValueError("Loaded model does not support voice design generation")
        self._validate_languages([language])
        nsm = self._resolve_non_streaming_mode(non_streaming_mode, default=True)
        tie, tam, tth, tpe = self._prepare_generation_custom(
            text, language, None, instruct=instruct, non_streaming_mode=nsm
        )
        codec_ids, timing = gen_lib.fast_generate(
            self.params, self.config, tie, tam, tth, tpe,
            max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
            min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
            top_p=top_p, do_sample=do_sample, repetition_penalty=repetition_penalty,
            seed=seed, device_chunk=self.device_chunk,
        )
        if codec_ids is None:
            logger.warning("Generation returned no tokens")
            return [np.zeros(1, np.float32)], self.sample_rate
        audio, sr = self._decode_audio(codec_ids, None)
        self._log_rtf(timing)
        return audio, sr

    def generate_voice_design_streaming(
        self,
        text: str,
        instruct: str,
        language: str,
        non_streaming_mode: Optional[bool] = None,
        max_new_tokens: int = 2048,
        min_new_tokens: int = 2,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        do_sample: bool = True,
        repetition_penalty: float = 1.05,
        chunk_size: int = 12,
        first_chunk_size: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Generator[Tuple[np.ndarray, int, Dict[str, Any]], None, None]:
        if self.tts_model_type != "voice_design":
            raise ValueError("Loaded model does not support voice design generation")
        self._validate_languages([language])
        nsm = self._resolve_non_streaming_mode(non_streaming_mode, default=True)
        tie, tam, tth, tpe = self._prepare_generation_custom(
            text, language, None, instruct=instruct, non_streaming_mode=nsm
        )
        stream = gen_lib.fast_generate_streaming_fused(
            self.params, self.config, tie, tam, tth, tpe,
            max_seq_len=self.max_seq_len, max_new_tokens=max_new_tokens,
            min_new_tokens=min_new_tokens, temperature=temperature, top_k=top_k,
            top_p=top_p, do_sample=do_sample, repetition_penalty=repetition_penalty,
            chunk_size=chunk_size, seed=seed, fuse_first_chunk=True,
            first_chunk_size=first_chunk_size,
        )
        yield from self._stream_decode(stream, chunk_size, None)
