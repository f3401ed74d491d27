"""Continuous-batching scheduler tests (synchronous, via batcher.step())."""

import numpy as np

from qwen3_asr_rs_tpu.runtime.serving import ContinuousBatcher, Request

from test_engine_e2e import make_engine
import pytest

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


def _drive(batcher, until, max_iters=200):
    for _ in range(max_iters):
        if until():
            return
        batcher.step(block_timeout=0.001)
    raise AssertionError("batcher did not converge")


def test_single_request_matches_offline_engine(rng):
    """One request through the batcher == engine.transcribe_samples."""
    eng, *_ = make_engine(max_new=4)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    req = Request(samples)
    batcher.submit(req)
    _drive(batcher, lambda: req.event.is_set())

    offline = eng.transcribe_samples(samples)
    assert req.result.raw_output == offline.raw_output


def test_short_request_not_held_by_long(rng):
    """Per-example early return: a request with a short decode completes
    while a longer one is still generating (round-1: the whole batch
    waited for its slowest member)."""
    eng, *_ = make_engine(max_new=32)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)

    long_req = Request(
        (rng.standard_normal(32000) * 0.1).astype(np.float32),
        max_new_tokens=32,
    )
    short_req = Request(
        (rng.standard_normal(8000) * 0.1).astype(np.float32),
        max_new_tokens=2,
    )
    batcher.submit(long_req)
    batcher.submit(short_req)

    _drive(batcher, lambda: short_req.event.is_set())
    # the long request must still be decoding when the short one returns
    assert not long_req.event.is_set()
    assert len(short_req.result.raw_output.split()) <= 2

    _drive(batcher, lambda: long_req.event.is_set())
    assert long_req.result is not None
    assert long_req.finish_time > short_req.finish_time


def test_mid_flight_admission(rng):
    """A request arriving while another decodes is admitted at the next
    segment boundary, not after the in-flight decode drains."""
    eng, *_ = make_engine(max_new=32)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)

    first = Request(
        (rng.standard_normal(16000) * 0.1).astype(np.float32),
        max_new_tokens=32,
    )
    batcher.submit(first)
    batcher.step()  # admit + first segment
    assert not first.event.is_set()

    second = Request(
        (rng.standard_normal(16000) * 0.1).astype(np.float32),
        max_new_tokens=2,
    )
    batcher.submit(second)
    _drive(batcher, lambda: second.event.is_set())
    assert not first.event.is_set()  # overtaken by the later, shorter req
    _drive(batcher, lambda: first.event.is_set())


def test_mixed_lengths_match_individual_runs(rng):
    """Slots are isolated: concurrent mixed-bucket requests each produce
    exactly the tokens a solo engine run produces."""
    eng, *_ = make_engine(max_new=3)
    batcher = ContinuousBatcher(eng, n_slots=4, segment_steps=2)

    clips = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (8000, 30000, 64000, 16000)
    ]
    reqs = [Request(c) for c in clips]
    for r in reqs:
        batcher.submit(r)
    _drive(batcher, lambda: all(r.event.is_set() for r in reqs))

    for clip, r in zip(clips, reqs):
        offline = eng.transcribe_samples(clip)
        assert r.result.raw_output == offline.raw_output


def test_chunked_admission_matches_offline_engine(rng):
    """Chunked prefill admission (prompt > prefill_chunk_tokens) emits the
    exact tokens of the offline engine's monolithic prefill."""
    eng, *_ = make_engine(max_new=4)
    batcher = ContinuousBatcher(
        eng, n_slots=2, segment_steps=2, prefill_chunk_tokens=16
    )

    samples = (rng.standard_normal(64000) * 0.1).astype(np.float32)
    req = Request(samples)
    batcher.submit(req)
    _drive(batcher, lambda: req.event.is_set())

    offline = eng.transcribe_samples(samples)
    assert req.result.raw_output == offline.raw_output


def test_chunked_admission_interleaves_with_decode(rng):
    """While a long prompt prefills chunk-by-chunk, an already-decoding
    slot keeps making progress every scheduler iteration (the admission
    never stalls decode for more than one chunk)."""
    eng, *_ = make_engine(max_new=32)
    batcher = ContinuousBatcher(
        eng, n_slots=2, segment_steps=1, prefill_chunk_tokens=16
    )

    decoding = Request(
        (rng.standard_normal(8000) * 0.1).astype(np.float32),
        max_new_tokens=32,
    )
    batcher.submit(decoding)
    batcher.step()  # admit (short prompt -> monolithic) + first segment
    assert not decoding.event.is_set()

    long_req = Request(
        (rng.standard_normal(64000) * 0.1).astype(np.float32),
        max_new_tokens=2,
    )
    batcher.submit(long_req)
    batcher.step()  # admits chunked; must still run a decode segment
    assert 1 in batcher.prefilling or 0 in batcher.prefilling
    pos_before = batcher.pos[0]

    # drive until the long request's prefill commits; the decoding slot
    # must advance during every interleaved iteration
    for _ in range(50):
        if not batcher.prefilling:
            break
        batcher.step()
    assert not batcher.prefilling
    assert batcher.pos[0] > pos_before or decoding.event.is_set()

    _drive(batcher, lambda: long_req.event.is_set())
    _drive(batcher, lambda: decoding.event.is_set())
    assert long_req.result is not None
    assert decoding.result is not None


def test_serving_loop_stop_and_join(rng):
    """ServingLoop must join cleanly (a _stop Event attribute used to
    shadow threading.Thread's private _stop() and crash join())."""
    from qwen3_asr_rs_tpu.runtime.serving import ServingLoop

    eng, *_ = make_engine(max_new=2)
    batcher = ContinuousBatcher(eng, n_slots=1, segment_steps=1)
    loop = ServingLoop(batcher)
    loop.start()
    req = Request((rng.standard_normal(8000) * 0.1).astype(np.float32))
    batcher.submit(req)
    req.wait(timeout=120)
    loop.stop()
    loop.join(timeout=30)
    assert not loop.is_alive()


def test_oversized_request_rejected(rng):
    eng, *_ = make_engine(max_new=2)  # buckets (2, 4, 8)
    batcher = ContinuousBatcher(eng, n_slots=1, segment_steps=1)
    import pytest

    with pytest.raises(ValueError, match="chunks"):
        batcher.submit(
            Request(np.zeros(16000 * 20, np.float32))  # 20 s > 8-chunk max
        )


def test_segmented_encode_admission_matches_offline_engine(rng):
    """Clips spanning multiple encoder window groups encode one group
    per scheduler step (segmented admission) and still emit the exact
    offline-engine tokens — window independence makes group-wise
    encoding mathematically identical to the full-clip pass."""
    import dataclasses

    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg, thinker_config=dataclasses.replace(
            cfg.thinker_config, text_config=text
        )
    )
    eng = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=3,
        chunk_buckets=(16,), config=cfg,
        params=(init_encoder_params(cfg.audio, dtype=jnp.float32),
                init_decoder_params(cfg.text, dtype=jnp.float32)),
        tokenizer=MockTokenizer(),
    )
    # 10 chunks of audio -> bucket 16; groups of 1 window (8 chunks)
    # -> 2 encode groups
    batcher = ContinuousBatcher(
        eng, n_slots=2, segment_steps=2, prefill_chunk_tokens=16,
        encode_window_groups=1, max_chunks=16,
    )
    samples = (rng.standard_normal(16000 * 10) * 0.1).astype(np.float32)
    req = Request(samples)
    batcher.submit(req)
    # drive: the first steps must leave the slot in the encoding phase
    batcher.step()
    assert 0 in batcher.encoding and batcher.encoding[0].n_groups == 2
    _drive(batcher, lambda: req.event.is_set())
    assert not batcher.encoding

    offline = eng.transcribe_samples(samples)
    assert req.result.raw_output == offline.raw_output


def test_slab_headroom_scales_with_segment_steps(rng):
    """s_max headroom must cover pipelining overshoot for ANY
    segment_steps, not just the default 8 (ADVICE r2)."""
    eng, *_ = make_engine(max_new=4)
    small = ContinuousBatcher(eng, n_slots=2, segment_steps=2)
    big = ContinuousBatcher(eng, n_slots=2, segment_steps=24)
    assert big.s_max - big.max_new >= 24 + (small.s_max - small.max_new - 8)
    assert small.s_max - small.max_new >= 8


def test_batcher_under_dp_mesh_matches_offline(rng):
    """Mesh serving: slot pool sharded over dp, segment graph GSPMD-
    partitioned — results must match the unsharded offline engine."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.parallel.mesh import make_mesh
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg, thinker_config=dataclasses.replace(cfg.thinker_config,
                                                text_config=text)
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine(mesh):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=4,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            mesh=mesh,
        )

    mesh = make_mesh(n_devices=4, tp=1)  # dp=4
    meshed = engine(mesh)
    batcher = ContinuousBatcher(meshed, n_slots=2, segment_steps=2)
    assert batcher.n_slots == 4  # rounded up to the dp multiple
    assert batcher.mesh is mesh

    reqs = [
        Request((rng.standard_normal(n) * 0.1).astype(np.float32))
        for n in (20000, 9000, 14000)
    ]
    for r in reqs:
        batcher.submit(r)
    _drive(batcher, lambda: all(r.event.is_set() for r in reqs),
           max_iters=400)

    offline = engine(None)
    for r in reqs:
        want = offline.transcribe_samples(r.samples)
        assert r.result.raw_output == want.raw_output


def test_serving_precision_auto_select(rng, monkeypatch):
    """Per-segment precision auto-select: at/below the occupancy
    threshold segments run int8, above it bf16; threshold 0 reproduces
    the engine-precision results exactly."""
    eng, *_ = make_engine(max_new=4)

    # threshold 0: every live segment runs the bf16 (= engine) params
    monkeypatch.setenv("ASR_SERVING_INT8_MAX_OCC", "0")
    auto = ContinuousBatcher(
        eng, n_slots=2, segment_steps=2, serving_precision="auto"
    )
    assert set(auto._params_by_precision) == {"engine", "bf16", "int8"}
    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    req = Request(samples)
    auto.submit(req)
    _drive(auto, lambda: req.event.is_set())
    offline = eng.transcribe_samples(samples)
    assert req.result.raw_output == offline.raw_output

    # huge threshold: segments pick the int8 copy
    monkeypatch.setenv("ASR_SERVING_INT8_MAX_OCC", "99")
    b8 = ContinuousBatcher(
        eng, n_slots=2, segment_steps=2, serving_precision="auto"
    )
    r8 = Request(samples)
    b8.submit(r8)
    b8.step(block_timeout=0.001)  # admit; slot live
    assert b8._segment_params() is b8._params_by_precision["int8"]
    _drive(b8, lambda: r8.event.is_set())
    assert isinstance(r8.result.raw_output, str)

    import pytest

    with pytest.raises(ValueError, match="serving_precision"):
        ContinuousBatcher(eng, n_slots=2, serving_precision="fp4")


def test_warmup_compiles_and_leaves_batcher_idle(rng):
    """warmup() drives every bucket + a full burst, then real traffic
    still matches the offline engine and no warmup state leaks."""
    eng, *_ = make_engine(max_new=8)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)
    batcher.warmup()

    assert all(s.request is None for s in batcher.slots)
    assert batcher.queue.empty()

    # batched-admission graphs key on (bucket, padded size); warmup must
    # cover EVERY bucket, not just the smallest (a cold batched compile
    # mid-burst stalls the whole pool — measured 6.8x vs 180x aggregate)
    sizes = []
    g = 2
    while g <= min(batcher.admit_batch_max, batcher.n_slots):
        sizes.append(g)
        g *= 2
    for c in eng.chunk_buckets:
        if c > batcher.max_chunks:
            continue
        for n in sizes:
            assert (c, n) in batcher._batch_prefill_jit, (
                f"warmup missed batched-admission graph ({c}, {n})"
            )

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    req = Request(samples)
    batcher.submit(req)
    _drive(batcher, lambda: req.event.is_set())
    offline = eng.transcribe_samples(samples)
    assert req.result.raw_output == offline.raw_output


def test_max_chunks_below_smallest_bucket_rejected(rng):
    eng, *_ = make_engine(max_new=4)
    with pytest.raises(ValueError, match="smallest engine bucket"):
        ContinuousBatcher(eng, n_slots=1, max_chunks=1)


def test_auto_precision_repreps_lm_fold(rng, monkeypatch):
    """With ASR_FOLD_LM=1, the derived int8 param set must carry fresh
    prepared fold operands (quantize strips the engine's bf16 ones; an
    unprepared fold would copy the lm_head per decode segment)."""
    monkeypatch.setenv("ASR_FOLD_LM", "1")
    eng, *_ = make_engine(max_new=4)
    assert "lm_fold_w" in eng.dec_params
    b = ContinuousBatcher(
        eng, n_slots=2, segment_steps=2, serving_precision="auto"
    )
    q8 = b._params_by_precision["int8"]
    assert "lm_fold_w" in q8
    assert q8["lm_fold_w"].dtype.name == "int8"

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    req = Request(samples)
    b.submit(req)
    _drive(b, lambda: req.event.is_set())
    offline = eng.transcribe_samples(samples)
    assert req.result.raw_output == offline.raw_output


def test_default_max_chunks_clamps_to_smallest_bucket(rng):
    """Engines whose smallest bucket exceeds 120 chunks must still
    construct a batcher with default arguments."""
    import dataclasses

    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg, thinker_config=dataclasses.replace(cfg.thinker_config,
                                                text_config=text)
    )
    eng = AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=2,
        chunk_buckets=(128, 240), config=cfg,
        params=(init_encoder_params(cfg.audio, dtype=jnp.float32),
                init_decoder_params(cfg.text, dtype=jnp.float32)),
        tokenizer=MockTokenizer(),
    )
    b = ContinuousBatcher(eng, n_slots=1, segment_steps=1)
    assert b.max_chunks == 128


def test_auto_precision_lm_bits_pinned(rng, monkeypatch):
    """An ambient ASR_LM_BITS=4 must not leak into the serving-derived
    int8 copy (auto-select tables were measured with an int8 lm_head;
    with ASR_FOLD_LM it would KeyError at construction)."""
    monkeypatch.setenv("ASR_LM_BITS", "4")
    monkeypatch.setenv("ASR_FOLD_LM", "1")
    eng, *_ = make_engine(max_new=2)
    b = ContinuousBatcher(
        eng, n_slots=2, segment_steps=2, serving_precision="auto"
    )
    q8 = b._params_by_precision["int8"]
    assert "lm_head_q" in q8 and "lm_head_q4" not in q8


def _kv8_engine(max_new=4):
    """Engine sharing make_engine's weights but with an int8 KV cache."""
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    _, cfg, enc_params, dec_params = make_engine(max_new=max_new)
    return AsrEngine(
        model_dir=None, dtype=jnp.float32, max_new_tokens=max_new,
        chunk_buckets=(2, 4, 8), config=cfg,
        params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        kv_dtype="int8",
    )


def test_serving_int8_kv_pool_matches_engine(rng):
    """kv_dtype='int8' slot pool == the int8-KV offline engine, token
    for token: prefill/commit quantize with the same per-slot scheme
    the engine's fused graph uses, decode dequantizes identically."""
    eng = _kv8_engine(max_new=4)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)
    assert batcher.kv_quant  # inherited from the engine's kv_dtype
    assert batcher.cache.k_scale is not None

    clips = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (20000, 9000)
    ]
    reqs = [Request(c) for c in clips]
    for r in reqs:
        batcher.submit(r)
    _drive(batcher, lambda: all(r.event.is_set() for r in reqs))
    for clip, r in zip(clips, reqs):
        offline = eng.transcribe_samples(clip)
        assert r.result.raw_output == offline.raw_output


def test_serving_int8_kv_chunked_admission(rng):
    """Chunked prefill writes a quantized temp cache and commits it
    (values + scales) into the int8 slab — tokens still match the
    offline int8-KV engine."""
    eng = _kv8_engine(max_new=3)
    batcher = ContinuousBatcher(
        eng, n_slots=2, segment_steps=2, prefill_chunk_tokens=16,
        kv_dtype="int8",
    )
    samples = (rng.standard_normal(64000) * 0.1).astype(np.float32)
    req = Request(samples)
    batcher.submit(req)
    _drive(batcher, lambda: req.event.is_set())
    offline = eng.transcribe_samples(samples)
    assert req.result.raw_output == offline.raw_output


def test_serving_kv_dtype_validation():
    eng = make_engine(max_new=2)[0]
    with pytest.raises(ValueError, match="kv_dtype"):
        ContinuousBatcher(eng, n_slots=1, kv_dtype="fp8")


def test_serving_int8_kv_on_dp_mesh(rng):
    """int8 slab + scales shard over a dp mesh; tokens match offline."""
    import dataclasses

    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.parallel.mesh import make_mesh
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg, thinker_config=dataclasses.replace(
            cfg.thinker_config, text_config=text
        )
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def engine(mesh):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=3,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            kv_dtype="int8", mesh=mesh,
        )

    mesh = make_mesh(n_devices=2, tp=1)  # dp=2
    batcher = ContinuousBatcher(engine(mesh), n_slots=2, segment_steps=2)
    assert batcher.kv_quant and batcher.cache.k_scale is not None

    reqs = [
        Request((rng.standard_normal(n) * 0.1).astype(np.float32))
        for n in (20000, 9000)
    ]
    for r in reqs:
        batcher.submit(r)
    _drive(batcher, lambda: all(r.event.is_set() for r in reqs),
           max_iters=400)
    offline = engine(None)
    for r in reqs:
        want = offline.transcribe_samples(r.samples)
        assert r.result.raw_output == want.raw_output


def test_batched_admission_matches_serialized_and_offline(rng):
    """A same-bucket burst admitted in ONE batched prefill dispatch must
    emit exactly the tokens of serialized per-request admission (and of
    the offline engine): the batched graph is the same math at B=n."""
    eng, *_ = make_engine(max_new=4)
    clips = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (8000, 20000, 16000, 30000)  # all bucket 2
    ]

    batched = ContinuousBatcher(eng, n_slots=4, segment_steps=2)
    assert batched.admit_batch_max > 1
    reqs = [Request(c) for c in clips]
    for r in reqs:
        batched.submit(r)
    batched.step(block_timeout=0.001)  # one step admits the whole burst
    # ONE size-4 graph for the bucket-2 burst
    assert (2, 4) in batched._batch_prefill_jit
    _drive(batched, lambda: all(r.event.is_set() for r in reqs))

    serial = ContinuousBatcher(
        eng, n_slots=4, segment_steps=2, admit_batch_max=1
    )
    sreqs = [Request(c) for c in clips]
    for r in sreqs:
        serial.submit(r)
    _drive(serial, lambda: all(r.event.is_set() for r in sreqs))

    for clip, r, s in zip(clips, reqs, sreqs):
        offline = eng.transcribe_samples(clip)
        assert r.result.raw_output == offline.raw_output
        assert s.result.raw_output == offline.raw_output


def test_batched_admission_pads_to_power_of_two(rng):
    """A group of 3 pads to 4 by replicating row 0 (same slot id): the
    duplicate write carries identical data, results unaffected."""
    eng, *_ = make_engine(max_new=3)
    batcher = ContinuousBatcher(eng, n_slots=4, segment_steps=2)
    clips = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (8000, 20000, 16000)
    ]
    reqs = [Request(c) for c in clips]
    for r in reqs:
        batcher.submit(r)
    batcher.step(block_timeout=0.001)
    assert (2, 4) in batcher._batch_prefill_jit  # padded size compiled
    _drive(batcher, lambda: all(r.event.is_set() for r in reqs))
    for clip, r in zip(clips, reqs):
        offline = eng.transcribe_samples(clip)
        assert r.result.raw_output == offline.raw_output


def test_batched_admission_mixed_buckets_and_temperature(rng):
    """Mixed buckets split into per-bucket groups; sampled rows draw
    their first token inside the batched graph and still return text."""
    eng, *_ = make_engine(max_new=4)
    batcher = ContinuousBatcher(eng, n_slots=4, segment_steps=2)
    short = [
        Request((rng.standard_normal(8000) * 0.1).astype(np.float32),
                temperature=0.8 if i == 0 else 0.0)
        for i in range(2)
    ]  # bucket 2
    longs = [
        Request((rng.standard_normal(64000) * 0.1).astype(np.float32))
        for _ in range(2)
    ]  # bucket 4
    for r in short + longs:
        batcher.submit(r)
    _drive(batcher, lambda: all(
        r.event.is_set() for r in short + longs
    ))
    for r in short + longs:
        assert isinstance(r.result.raw_output, str)
    # the greedy rows still match offline exactly
    offline = eng.transcribe_samples(short[1].samples)
    assert short[1].result.raw_output == offline.raw_output


def test_batched_admission_int8_kv_slab(rng):
    """Batched admission into a quantized slot pool: the batched tmp
    cache quantizes and commits values + scales row-by-row."""
    eng = _kv8_engine(max_new=3)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)
    assert batcher.kv_quant
    clips = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (20000, 9000)
    ]
    reqs = [Request(c) for c in clips]
    for r in reqs:
        batcher.submit(r)
    batcher.step(block_timeout=0.001)
    assert (2, 2) in batcher._batch_prefill_jit
    _drive(batcher, lambda: all(r.event.is_set() for r in reqs))
    for clip, r in zip(clips, reqs):
        offline = eng.transcribe_samples(clip)
        assert r.result.raw_output == offline.raw_output


def test_nucleus_tiny_top_p_matches_greedy(rng):
    """Per-request nucleus end to end: temperature > 0 with a tiny
    top_p keeps only the top-1 token of the scaled distribution, and
    temperature scaling preserves argmax order — so the output must be
    token-identical to the greedy offline engine. Exercises the
    admission tok0 sample AND the nucleus segment variant."""
    eng, *_ = make_engine(max_new=4)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    req = Request(samples, temperature=3.0, top_p=1e-6)
    batcher.submit(req)
    _drive(batcher, lambda: req.event.is_set())

    assert "nucleus" in batcher._segment  # the third variant compiled
    offline = eng.transcribe_samples(samples)
    assert req.result.raw_output == offline.raw_output


def test_nucleus_row_leaves_greedy_neighbors_exact(rng):
    """A live nucleus request routes the whole pool through the nucleus
    segment variant; greedy rows (temperature 0, top_p 1) must still be
    bitwise offline-exact inside that graph."""
    eng, *_ = make_engine(max_new=3)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)

    greedy_clip = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    nuc_clip = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    greedy = Request(greedy_clip)
    nuc = Request(nuc_clip, temperature=0.9, top_p=0.8)
    batcher.submit(greedy)
    batcher.submit(nuc)
    _drive(batcher, lambda: greedy.event.is_set() and nuc.event.is_set())

    offline = eng.transcribe_samples(greedy_clip)
    assert greedy.result.raw_output == offline.raw_output
    assert isinstance(nuc.result.raw_output, str)


def test_nucleus_only_when_requested(rng):
    """temperature-only traffic never compiles the nucleus variant
    (its full-vocab sort stays out of the segment graph)."""
    eng, *_ = make_engine(max_new=2)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)
    req = Request(
        (rng.standard_normal(12000) * 0.1).astype(np.float32),
        temperature=0.7,
    )
    batcher.submit(req)
    _drive(batcher, lambda: req.event.is_set())
    assert "sample" in batcher._segment
    assert "nucleus" not in batcher._segment
    # top_p < 1 at temperature 0 is ignored (OpenAI semantics): greedy
    req2 = Request(
        (rng.standard_normal(12000) * 0.1).astype(np.float32),
        top_p=0.5,
    )
    batcher.submit(req2)
    _drive(batcher, lambda: req2.event.is_set())
    assert "nucleus" not in batcher._segment


def test_request_top_p_validation():
    for bad in (0.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="top_p"):
            Request(np.zeros(1600, np.float32), top_p=bad)
