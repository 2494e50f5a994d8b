"""Continuous batching (serving.ContinuousBatcher + core.insert_slot):
requests join a RUNNING batch at chunk boundaries (VERDICT r4 next #6).

Gold property: a stream admitted into a live batch produces the SAME greedy
audio as its solo streaming run — lane surgery (insert_slot) must be
invisible to the stream's own decode."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.model import FasterQwen3TTS
from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer, PromptTokenizer

MAXNEW = 12
CHUNK = 4


@pytest.fixture(scope="module")
def model(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, tts_bos_token_id=300, tts_eos_token_id=301, tts_pad_token_id=302
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    m = FasterQwen3TTS(params, cfg, PromptTokenizer(ByteTokenizer()), max_seq_len=128)
    m._warmed_up = True
    return m


def _xvec_prompt(seed):
    rng = np.random.default_rng(seed)
    return {
        "ref_spk_embedding": [rng.standard_normal(2048).astype(np.float32)],
        "x_vector_only_mode": [True], "icl_mode": [False], "ref_code": [None],
    }


def _requests(n):
    texts = ["Hello world.", "A different second sentence.",
             "Third stream content here.", "Fourth one."]
    return [
        {"text": texts[i % len(texts)], "xvec_only": True,
         "voice_clone_prompt": _xvec_prompt(i)}
        for i in range(n)
    ]


def _solo(model, req):
    parts = []
    for audio, _sr, _t in model.generate_voice_clone_streaming(
        req["text"], "English", voice_clone_prompt=req["voice_clone_prompt"],
        xvec_only=True, chunk_size=CHUNK, max_new_tokens=MAXNEW,
        do_sample=False, seed=0, subtalker_dosample=False,
    ):
        parts.append(audio)
    return np.concatenate(parts)


def _greedy_batcher(model, max_slots):
    return model.continuous_batcher(
        max_slots=max_slots, chunk_size=CHUNK, max_new_tokens=MAXNEW,
        do_sample=False, seed=0, subtalker_dosample=False,
    )


def test_all_submitted_upfront_matches_solo(model):
    reqs = _requests(3)
    cb = _greedy_batcher(model, max_slots=3)
    sids = [cb.submit(r) for r in reqs]
    got = {sid: [] for sid in sids}
    for sid, audio, sr, timing in cb.run():
        assert sr == model.sample_rate
        got[sid].append(audio)
    for sid, req in zip(sids, reqs):
        want = _solo(model, req)
        have = np.concatenate(got[sid])
        assert have.shape == want.shape, (sid, have.shape, want.shape)
        np.testing.assert_allclose(have, want, atol=1e-4)


def test_late_join_into_running_batch_matches_solo(model):
    """Stream 2 submitted AFTER the batch has decoded chunks: it must enter
    at a boundary and still match its solo greedy audio exactly."""
    reqs = _requests(2)
    cb = _greedy_batcher(model, max_slots=2)
    sid0 = cb.submit(reqs[0])
    got = {sid0: []}
    sid1 = None
    pump = cb.run()
    for sid, audio, sr, timing in pump:
        got.setdefault(sid, []).append(audio)
        if sid1 is None and timing["chunk_index"] >= 1:
            sid1 = cb.submit(reqs[1])
            got[sid1] = []
    assert sid1 is not None, "second stream never submitted (first too short)"
    for sid, req in ((sid0, reqs[0]), (sid1, reqs[1])):
        want = _solo(model, req)
        have = np.concatenate(got[sid])
        np.testing.assert_allclose(have, want, atol=1e-4)
    # admission waited for a boundary, not a fresh lockstep batch
    # (admit_wait_ms recorded relative to submit)


def test_slot_reuse_after_finish(model):
    """More streams than slots: finished lanes are re-used; every stream
    completes with its full solo audio."""
    reqs = _requests(4)
    cb = _greedy_batcher(model, max_slots=2)
    sids = [cb.submit(r) for r in reqs]
    got = {sid: [] for sid in sids}
    slots_seen = {}
    for sid, audio, _sr, timing in cb.run():
        got[sid].append(audio)
        slots_seen.setdefault(sid, timing["slot"])
    assert len(slots_seen) == 4
    assert max(slots_seen.values()) <= 1  # only 2 lanes ever exist
    for sid, req in zip(sids, reqs):
        want = _solo(model, req)
        np.testing.assert_allclose(np.concatenate(got[sid]), want, atol=1e-4)


def test_run_wait_serves_across_idle_gap_until_close(model):
    """Server mode: run(wait=True) keeps pumping across an idle gap; a
    request submitted from another thread AFTER the first stream drained is
    still served; close() ends the loop."""
    import threading
    import time as _time

    reqs = _requests(2)
    cb = _greedy_batcher(model, max_slots=2)
    sid0 = cb.submit(reqs[0])

    def feeder():
        _time.sleep(0.5)
        cb.submit(reqs[1])
        cb.close()

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    got = {}
    for sid, audio, _sr, _t in cb.run(wait=True):
        got.setdefault(sid, []).append(audio)
    th.join()
    assert len(got) == 2
    for sid, req in zip(sorted(got), reqs):
        np.testing.assert_allclose(np.concatenate(got[sid]), _solo(model, req), atol=1e-4)


def test_ttfa_metadata_present(model):
    cb = _greedy_batcher(model, max_slots=2)
    cb.submit(_requests(1)[0])
    timings = [t for _sid, _a, _sr, t in cb.run()]
    assert timings[0]["ttfa_from_submit_ms"] >= timings[0]["admit_wait_ms"] >= 0.0
    assert timings[-1]["is_final"]


def test_mature_lane_fused_vocode_matches_solo(model):
    """Streams longer than the vocoder context (24 frames) switch from the
    per-lane host vocoder to the batched device window vocode; the seam and
    every fused chunk must still match the solo stream sample-for-sample."""
    from faster_qwen3_tts_tpu.engine.generate import CONTEXT_FRAMES

    maxnew = CONTEXT_FRAMES + 2 * 8  # 3 host chunks, then >=2 fused chunks
    reqs = _requests(2)

    def solo(req):
        parts = []
        for audio, _sr, _t in model.generate_voice_clone_streaming(
            req["text"], "English", voice_clone_prompt=req["voice_clone_prompt"],
            xvec_only=True, chunk_size=8, max_new_tokens=maxnew,
            min_new_tokens=maxnew, do_sample=False, seed=0, subtalker_dosample=False,
        ):
            parts.append(audio)
        return np.concatenate(parts)

    cb = model.continuous_batcher(
        max_slots=2, chunk_size=8, max_new_tokens=maxnew, min_new_tokens=maxnew,
        do_sample=False, seed=0, subtalker_dosample=False,
    )
    sids = [cb.submit(r) for r in reqs]
    got = {sid: [] for sid in sids}
    for sid, audio, _sr, _t in cb.run():
        got[sid].append(audio)
    for sid, req in zip(sids, reqs):
        want = solo(req)
        have = np.concatenate(got[sid])
        assert have.shape == want.shape, (sid, have.shape, want.shape)
        # the stream must actually cross the context boundary, or the fused
        # branch was never taken and this test proves nothing
        up = model.config.codec.total_upsample
        assert len(have) > CONTEXT_FRAMES * up, "stream ended before maturity"
        np.testing.assert_allclose(have, want, atol=1e-4)


def test_solo_first_chunk_emitted_at_admission(model):
    """Round-5 TTFA fix: a stream's FIRST emission happens at admission
    (solo_first_chunk=True, B=1 executables), not after the next pool-wide
    chunk — at B=8 a pool chunk walls ~0.5 s, which dominated
    TTFA-from-submit in the first r5 capture."""
    reqs = _requests(2)
    cb = _greedy_batcher(model, max_slots=2)
    sids = [cb.submit(r) for r in reqs]
    first_emit = {}
    for sid, audio, _sr, timing in cb.run():
        if sid not in first_emit:
            first_emit[sid] = (timing, len(audio))
    for sid in sids:
        timing, n = first_emit[sid]
        assert timing.get("solo_first_chunk") is True
        assert timing["chunk_steps"] == CHUNK and n > 0
        # emitted before any pool chunk advanced the stream further
        assert timing["total_steps_so_far"] == CHUNK


def test_smaller_solo_first_chunk_matches_solo(model):
    """first_chunk_size < chunk_size: earlier first audio, stream audio
    still byte-identical to the solo run (the lane enters the pool with a
    partial chunk emitted; hist seeding + frames_emitted stay consistent)."""
    reqs = _requests(2)
    cb = model.continuous_batcher(
        max_slots=2, chunk_size=CHUNK, first_chunk_size=2,
        max_new_tokens=MAXNEW, do_sample=False, seed=0, subtalker_dosample=False,
    )
    sids = [cb.submit(r) for r in reqs]
    got = {sid: [] for sid in sids}
    firsts = {}
    for sid, audio, _sr, timing in cb.run():
        got[sid].append(audio)
        firsts.setdefault(sid, timing)
    for sid, req in zip(sids, reqs):
        assert firsts[sid]["chunk_steps"] == 2  # the small solo chunk
        np.testing.assert_allclose(
            np.concatenate(got[sid]), _solo(model, req), atol=1e-4
        )


def test_mature_lane_with_solo_prefix_crosses_seam_exactly(model):
    """The maturity seam with a solo-first-chunk prefix: the hist window's
    seeded rows must make the first DEVICE-vocoded chunk sample-exact (a
    mis-seeded window would splice the previous occupant's frames into the
    vocoder context)."""
    from faster_qwen3_tts_tpu.engine.generate import CONTEXT_FRAMES

    maxnew = CONTEXT_FRAMES + 2 * 8
    req = _requests(1)[0]

    def solo(req):
        parts = []
        for audio, _sr, _t in model.generate_voice_clone_streaming(
            req["text"], "English", voice_clone_prompt=req["voice_clone_prompt"],
            xvec_only=True, chunk_size=8, max_new_tokens=maxnew,
            min_new_tokens=maxnew, do_sample=False, seed=0, subtalker_dosample=False,
        ):
            parts.append(audio)
        return np.concatenate(parts)

    # Pre-dirty the pool: run a throwaway stream first so slot 0's hist rows
    # hold ANOTHER stream's frames when the probe stream is admitted.
    cb = model.continuous_batcher(
        max_slots=1, chunk_size=8, max_new_tokens=maxnew, min_new_tokens=maxnew,
        do_sample=False, seed=0, subtalker_dosample=False,
    )
    cb.submit(_requests(2)[1])
    for _ in cb.run():
        pass
    sid = cb.submit(req)
    got = []
    for got_sid, audio, _sr, _t in cb.run():
        if got_sid == sid:
            got.append(audio)
    have = np.concatenate(got)
    want = solo(req)
    assert have.shape == want.shape
    np.testing.assert_allclose(have, want, atol=1e-4)


def test_eos_at_chunk_boundary_still_yields_is_final(model, monkeypatch):
    """A stream whose EOS lands exactly on a chunk boundary produces a
    zero-valid final chunk; the pump must still yield an is_final terminal
    (a server maps it to end-of-stream — without it the request hangs;
    code-review r5 finding #1)."""
    import jax.numpy as jnp

    from faster_qwen3_tts_tpu import serving as serving_mod

    real_call = serving_mod.aot.call
    state = {"chunks": 0}

    def fake_call(name, fn, **kw):
        if name == "decode_chunk":
            state["chunks"] += 1
            st, packed = real_call(name, fn, **kw)
            if state["chunks"] >= 2:
                # zero valid frames, done=True for every lane
                packed = packed.at[:, :, -2].set(0).at[:, :, -1].set(1)
                st = st._replace(done=jnp.ones_like(st.done))
            return st, packed
        return real_call(name, fn, **kw)

    monkeypatch.setattr(serving_mod.aot, "call", fake_call)
    cb = _greedy_batcher(model, max_slots=1)
    sid = cb.submit(_requests(1)[0])
    timings = [t for got_sid, _a, _sr, t in cb.run() if got_sid == sid]
    assert timings, "stream yielded nothing"
    assert timings[-1]["is_final"], "terminal chunk missing -> server would hang"
    assert timings[-1]["chunk_steps"] == 0  # the zero-valid final chunk


def test_cancel_releases_lane(model):
    """cancel(sid) frees the lane at the next boundary with one cancelled
    is_final terminal; the other stream is unaffected (code-review r5 #5)."""
    reqs = _requests(2)
    cb = model.continuous_batcher(
        max_slots=2, chunk_size=CHUNK, max_new_tokens=64,
        do_sample=False, seed=0, subtalker_dosample=False,
    )
    sid0, sid1 = cb.submit(reqs[0]), cb.submit(reqs[1])
    got = {sid0: [], sid1: []}
    finals = {}
    for sid, audio, _sr, timing in cb.run():
        got[sid].append(audio)
        if sid == sid0 and timing["chunk_index"] == 0:
            cb.cancel(sid0)
        if timing.get("is_final"):
            finals[sid] = timing
    assert finals[sid0].get("cancelled") is True
    assert finals[sid0]["total_steps_so_far"] <= 2 * CHUNK  # stopped early
    assert "cancelled" not in finals[sid1]
    assert sum(len(a) for a in got[sid1]) > sum(len(a) for a in got[sid0])


def test_oversized_request_fails_alone(model):
    """A request whose trailing text exceeds the pool's compiled bucket gets
    its own error terminal; co-tenant streams finish normally (code-review
    r5 #3 — previously the pump crashed, killing every in-flight stream)."""
    reqs = _requests(1)
    cb = _greedy_batcher(model, max_slots=2)
    ok_sid = cb.submit(reqs[0])
    bad = dict(reqs[0])
    bad["text"] = "word " * 3000  # tth far beyond the pool bucket
    bad_sid = cb.submit(bad)
    finals, audio_len = {}, {}
    for sid, audio, _sr, timing in cb.run():
        audio_len[sid] = audio_len.get(sid, 0) + len(audio)
        if timing.get("is_final"):
            finals[sid] = timing
    assert "error" in finals[bad_sid] and audio_len[bad_sid] == 0
    assert "error" not in finals[ok_sid] and audio_len[ok_sid] > 0
