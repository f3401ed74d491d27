"""Engine extras: warmup precompilation, long-form segmentation, errors."""

import numpy as np
import pytest

from qwen3_asr_rs_tpu.errors import AsrError, AudioError

from test_engine_e2e import make_engine

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


def test_warmup_precompiles_buckets(rng):
    eng, *_ = make_engine(max_new=2)
    eng.warmup(batch_sizes=(1,), buckets=(2,))
    assert (2, 1, None) in eng._graphs
    # a subsequent transcribe in that bucket reuses the compiled graph
    n_before = len(eng._graphs)
    eng.transcribe_samples(
        (rng.standard_normal(24000) * 0.1).astype(np.float32)
    )
    assert len(eng._graphs) == n_before


def test_long_form_segmentation(rng, tmp_path):
    # engine max bucket is 8 chunks = 8 s; a 20 s file must be segmented
    eng, *_ = make_engine(max_new=2)
    from test_audio_io import write_wav_pcm16

    wav = tmp_path / "long.wav"
    write_wav_pcm16(
        wav, rng.standard_normal(16000 * 20) * 0.1, 16000
    )
    result = eng.transcribe(str(wav))
    assert result.raw_output.count("\n") == 2  # three segments


def test_audio_error_on_garbage_file(tmp_path):
    from qwen3_asr_rs_tpu.audio.load import load_audio

    p = tmp_path / "junk.wav"
    p.write_bytes(b"not audio at all")
    with pytest.raises(AudioError):
        load_audio(str(p))
    assert issubclass(AudioError, AsrError)


def test_unknown_quantize_mode_rejected():
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from qwen3_asr_rs_tpu.config import tiny_test_config

    with pytest.raises(ValueError):
        AsrEngine(
            model_dir=None,
            config=tiny_test_config(),
            params=({}, {}),
            tokenizer=object(),
            quantize="int3",
        )


def test_unroll_decode_token_parity(rng):
    """unroll_decode=True must emit the same tokens as the scan decoder."""
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
            cfg.thinker_config, text_config=text)
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def eng(unroll):
        return AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=5,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
            unroll_decode=unroll,
        )

    samples = (rng.standard_normal(18000) * 0.1).astype("float32")
    scan = eng(False).transcribe_samples(samples)
    unrolled = eng(True).transcribe_samples(samples)
    assert unrolled.raw_output == scan.raw_output


def test_segmented_decode_token_parity(rng, monkeypatch):
    """Multi-stage (growing-slab) decode == single-stage decode tokens.

    The engine starts decode on a small slab and grows it only if
    generation continues past each segment cap; the emitted tokens must
    be identical to a single big-slab loop."""
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
            cfg.thinker_config, text_config=text)
    )
    enc_params = init_encoder_params(cfg.audio, dtype=jnp.float32)
    dec_params = init_decoder_params(cfg.text, dtype=jnp.float32)

    def run(seg):
        monkeypatch.setenv("ASR_DECODE_SEGMENT", str(seg))
        eng = AsrEngine(
            model_dir=None, dtype=jnp.float32, max_new_tokens=11,
            chunk_buckets=(2,), config=cfg,
            params=(enc_params, dec_params), tokenizer=MockTokenizer(),
        )
        samples = (rng.standard_normal(20000) * 0.1).astype("float32")
        single = eng.transcribe_samples(samples)
        batch = eng.transcribe_batch([samples, samples * 0.5])
        return single.raw_output, [r.raw_output for r in batch]

    rng_state = rng.bit_generator.state
    segmented = run(3)  # stages: 3, 11
    rng.bit_generator.state = rng_state
    single_stage = run(1024)  # one stage
    assert segmented == single_stage


def test_engine_warmup_compiles_buckets(rng):
    """warmup() drives every bucket; subsequent transcribes reuse the
    compiled graphs (graph cache keys present) and results still match
    a fresh engine."""
    from test_engine_e2e import make_engine

    eng, *_ = make_engine(max_new=3)
    eng.warmup()
    assert len(eng._graphs) >= len(eng.chunk_buckets)

    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    warm = eng.transcribe_samples(samples)
    fresh, *_ = make_engine(max_new=3)
    assert warm.raw_output == fresh.transcribe_samples(samples).raw_output


def test_transcribe_batch_input_validation(rng):
    from test_engine_e2e import make_engine

    eng, *_ = make_engine(max_new=2)
    assert eng.transcribe_batch([]) == []
    s = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    with pytest.raises(ValueError, match="languages"):
        eng.transcribe_batch([s, s], languages=["english"])


def test_decode_segment_env_validated(rng, monkeypatch):
    """ASR_DECODE_SEGMENT=0 must not hang the seg-caps builder."""
    from test_engine_e2e import make_engine

    monkeypatch.setenv("ASR_DECODE_SEGMENT", "0")
    eng, *_ = make_engine(max_new=3)
    s = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    r = eng.transcribe_samples(s)
    assert isinstance(r.raw_output, str)


def test_transcribe_clamps_segment_seconds(rng, tmp_path):
    """segment_seconds above the largest bucket segments at bucket
    capacity instead of crashing in _pick_bucket."""
    from test_engine_e2e import make_engine
    from test_audio_io import write_wav_pcm16

    eng, *_ = make_engine(max_new=2)  # buckets (2,4,8): max 8 s
    wav = tmp_path / "long.wav"
    write_wav_pcm16(wav, rng.standard_normal(16000 * 12) * 0.1, 16000)
    r = eng.transcribe(str(wav), segment_seconds=100.0)
    assert isinstance(r.text, str)


def test_warmup_is_born_done_and_reuses_production_graph(rng):
    """warmup() compiles the PRODUCTION graph (same cache key) but runs
    zero decode iterations: on random weights a silent clip would decode
    to the cap, which made warming long-form buckets take minutes."""
    eng, *_ = make_engine(max_new=64)
    eng.warmup(batch_sizes=(1,), buckets=(8,))
    assert (8, 1, None) in eng._graphs
    # born-done warmup emitted zero tokens (the same dispatch a live
    # transcribe uses, just with live=False rows)
    res = eng.transcribe_batch(
        [np.zeros(16000 * 8, np.float32)], _warmup=True
    )
    assert res[0].raw_output == ""
    # a real transcribe in that bucket reuses the warmed executable
    n_before = len(eng._graphs)
    out = eng.transcribe_samples(
        (rng.standard_normal(16000 * 8) * 0.1).astype(np.float32)
    )
    assert len(eng._graphs) == n_before
    assert out.raw_output != ""  # live rows still decode


def test_warmup_sampling_variant(rng):
    """warmup(sampling=...) compiles the SAMPLING graph a production
    sampled request reuses (matters most for speculative engines, whose
    spec-sampling graph is the slowest compile in the repo)."""
    from qwen3_asr_rs_tpu.runtime.sampling import SamplingParams

    eng, *_ = make_engine(max_new=8)
    sp = SamplingParams(temperature=0.7, top_k=8, seed=1)
    eng.warmup(batch_sizes=(1,), buckets=(8,), sampling=sp)
    assert (8, 1, (8, 1.0)) in eng._graphs
    n_before = len(eng._graphs)
    out = eng.transcribe_samples(
        (rng.standard_normal(16000 * 8) * 0.1).astype(np.float32),
        sampling=SamplingParams(temperature=0.9, top_k=8, seed=2),
    )
    assert len(eng._graphs) == n_before  # same key: temperature traced
    assert out.raw_output != ""
