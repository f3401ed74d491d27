"""Sampling decode tests: the sampler primitive, the engine graphs, and
the serving per-slot temperature path.

The reference is greedy-only (src/inference.rs:160-200); sampling is a
capability extension, so the load-bearing assertions here are (a) the
greedy contract is untouched — temperature 0 reproduces the exact greedy
tokens through every path — and (b) sampling is deterministic under a
fixed seed and actually stochastic across seeds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_rs_tpu.runtime.sampling import (
    SamplingParams,
    apply_top_k,
    apply_top_p,
    normalize,
    sample_token,
)


# ------------------------------------------------------------------ #
# primitive


def test_greedy_fallback_matches_argmax(rng):
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    ids = sample_token(logits, jax.random.PRNGKey(0), 0.0)
    np.testing.assert_array_equal(
        np.asarray(ids), np.argmax(np.asarray(logits), axis=-1)
    )


def test_top_k_one_is_argmax(rng):
    logits = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
    ids = sample_token(logits, jax.random.PRNGKey(1), 2.5, top_k=1)
    np.testing.assert_array_equal(
        np.asarray(ids), np.argmax(np.asarray(logits), axis=-1)
    )


def test_tiny_top_p_is_argmax(rng):
    logits = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
    ids = sample_token(logits, jax.random.PRNGKey(2), 3.0, top_p=1e-9)
    np.testing.assert_array_equal(
        np.asarray(ids), np.argmax(np.asarray(logits), axis=-1)
    )


def test_top_k_filter_masks_everything_else(rng):
    logits = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    kept = np.asarray(apply_top_k(logits, 5))
    for row, orig in zip(kept, np.asarray(logits)):
        finite = np.isfinite(row)
        assert finite.sum() == 5
        assert set(np.flatnonzero(finite)) == set(np.argsort(orig)[-5:])


def test_top_p_keeps_minimal_nucleus():
    # hand-built distribution: softmax probs ~ [0.6, 0.3, 0.06, ...]
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.06, 0.03, 0.01]]))
    kept = np.isfinite(np.asarray(apply_top_p(logits, 0.8)))
    # 0.6 < 0.8 so token 1 is included; 0.6+0.3 >= 0.8 stops there
    np.testing.assert_array_equal(kept[0], [True, True, False, False,
                                            False])
    # top token always survives even when p is smaller than its mass
    kept1 = np.isfinite(np.asarray(apply_top_p(logits, 0.1)))
    np.testing.assert_array_equal(kept1[0], [True, False, False, False,
                                             False])


def test_sampled_ids_respect_filters(rng):
    logits = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    top5 = {
        (r, c)
        for r in range(8)
        for c in np.argsort(np.asarray(logits)[r])[-5:]
    }
    for seed in range(20):
        ids = np.asarray(
            sample_token(logits, jax.random.PRNGKey(seed), 5.0, top_k=5)
        )
        for r, c in enumerate(ids):
            assert (r, int(c)) in top5


def test_deterministic_per_key_stochastic_across_keys(rng):
    logits = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    a = np.asarray(sample_token(logits, jax.random.PRNGKey(3), 1.0))
    b = np.asarray(sample_token(logits, jax.random.PRNGKey(3), 1.0))
    np.testing.assert_array_equal(a, b)
    draws = {
        tuple(
            np.asarray(sample_token(logits, jax.random.PRNGKey(s), 2.0))
        )
        for s in range(16)
    }
    assert len(draws) > 1  # flat-ish logits at temp 2: must vary


def test_per_row_temperature_vector(rng):
    logits = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    temp = jnp.asarray([0.0, 0.0, 8.0, 8.0], jnp.float32)
    greedy = np.argmax(np.asarray(logits), axis=-1)
    sampled_rows_differ = False
    for seed in range(16):
        ids = np.asarray(sample_token(logits, jax.random.PRNGKey(seed),
                                      temp))
        np.testing.assert_array_equal(ids[:2], greedy[:2])
        if (ids[2:] != greedy[2:]).any():
            sampled_rows_differ = True
    assert sampled_rows_differ


def test_distribution_sanity(rng):
    # temp-1 sampling over a 3-way categorical tracks softmax probs
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]]))
    counts = np.zeros(3)
    keys = jax.random.split(jax.random.PRNGKey(0), 600)
    sample_all = jax.jit(
        lambda ks: jax.vmap(
            lambda k: sample_token(logits, k, 1.0)[0]
        )(ks)
    )
    ids = np.asarray(sample_all(keys))
    for i in ids:
        counts[i] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.08)


def test_params_validation():
    with pytest.raises(ValueError):
        SamplingParams(top_p=0.0).validate()
    with pytest.raises(ValueError):
        SamplingParams(top_k=-1).validate()
    with pytest.raises(ValueError):
        SamplingParams(temperature=-0.5).validate()
    assert normalize(None).greedy
    assert not normalize(SamplingParams(temperature=0.9)).greedy


# ------------------------------------------------------------------ #
# engine path (tiny model; slow tier)


@pytest.mark.slow
def test_engine_sampling_paths(rng):
    from test_engine_e2e import make_engine

    eng, *_ = make_engine(max_new=6)
    clip = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    greedy = eng.transcribe_samples(clip)
    # temperature 0 through the sampling-params plumbing == greedy
    zero = eng.transcribe_samples(clip, sampling=SamplingParams())
    assert zero.raw_output == greedy.raw_output
    # top_k=1 == greedy at any temperature
    tk1 = eng.transcribe_samples(
        clip, sampling=SamplingParams(temperature=1.7, top_k=1, seed=5)
    )
    assert tk1.raw_output == greedy.raw_output

    s1 = eng.transcribe_samples(
        clip, sampling=SamplingParams(temperature=1.0, seed=7)
    )
    s2 = eng.transcribe_samples(
        clip, sampling=SamplingParams(temperature=1.0, seed=7)
    )
    assert s1.raw_output == s2.raw_output  # seeded determinism
    others = {
        eng.transcribe_samples(
            clip, sampling=SamplingParams(temperature=3.0, seed=s)
        ).raw_output
        for s in range(4)
    }
    assert len(others | {greedy.raw_output}) > 1


@pytest.mark.slow
def test_engine_batch_sampling_pad_rows_stay_dead(rng):
    from test_engine_e2e import make_engine

    eng, *_ = make_engine(max_new=4)
    clips = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (16000, 9000, 5000)
    ]
    outs = eng.transcribe_batch(
        clips, sampling=SamplingParams(temperature=1.0, seed=11)
    )
    assert len(outs) == 3
    outs2 = eng.transcribe_batch(
        clips, sampling=SamplingParams(temperature=1.0, seed=11)
    )
    assert [o.raw_output for o in outs] == [o.raw_output for o in outs2]


@pytest.mark.slow
def test_engine_longform_sampling_rejected(rng):
    from test_engine_e2e import make_engine

    eng, *_ = make_engine(max_new=4)
    # transcribe() on long audio must refuse stochastic decode
    import tempfile
    import wave as wave_mod

    long_samples = (rng.standard_normal(16000 * 40) * 0.1)
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        with wave_mod.open(f.name, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (long_samples * 32767 * 0.1).astype(np.int16).tobytes()
            )
        with pytest.raises(ValueError, match="long-form"):
            eng.transcribe(
                f.name, sampling=SamplingParams(temperature=0.8)
            )


@pytest.mark.slow
@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)
def test_dp_mesh_sampling_decorrelated_and_deterministic(rng):
    """Sampling under a dp shard_map: each shard folds its axis index
    into the key, so shard-local row i must NOT mirror row i of another
    shard; and the whole sharded call is seed-deterministic."""
    import dataclasses

    from qwen3_asr_rs_tpu.config import tiny_test_config
    from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
    from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
    from qwen3_asr_rs_tpu.parallel.mesh import make_mesh
    from qwen3_asr_rs_tpu.runtime.engine import AsrEngine
    from test_engine_e2e import MockTokenizer

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    cfg = dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(cfg.thinker_config,
                                           text_config=text),
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

    clip = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    batch = [clip] * 8  # identical inputs: only the PRNG separates rows
    mesh = make_mesh(n_devices=8, tp=1)
    eng = engine(mesh)
    hot = SamplingParams(temperature=4.0, seed=13)
    outs = [r.raw_output for r in eng.transcribe_batch(batch,
                                                       sampling=hot)]
    # identical audio + per-shard fold_in: rows must not all collapse
    # to one sequence (they would with a replicated, unfolded key)
    assert len(set(outs)) > 1
    outs2 = [r.raw_output for r in eng.transcribe_batch(batch,
                                                        sampling=hot)]
    assert outs == outs2  # sharded sampling is seed-deterministic


# ------------------------------------------------------------------ #
# serving path (slow tier)


@pytest.mark.slow
def test_serving_mixed_greedy_and_sampled_slots(rng):
    from test_engine_e2e import make_engine

    from qwen3_asr_rs_tpu.runtime.serving import (
        ContinuousBatcher,
        Request,
    )

    eng, *_ = make_engine(max_new=6)
    batcher = ContinuousBatcher(eng, n_slots=2, segment_steps=2)
    samples = (rng.standard_normal(20000) * 0.1).astype(np.float32)

    greedy_req = Request(samples)
    sampled_req = Request(samples, temperature=1.2)
    batcher.submit(greedy_req)
    batcher.submit(sampled_req)
    for _ in range(300):
        if greedy_req.event.is_set() and sampled_req.event.is_set():
            break
        batcher.step(block_timeout=0.001)
    assert greedy_req.event.is_set() and sampled_req.event.is_set()

    # the greedy slot is untouched by its sampled neighbor
    offline = eng.transcribe_samples(samples)
    assert greedy_req.result.raw_output == offline.raw_output
    assert sampled_req.result is not None


@pytest.mark.slow
def test_serving_temperature_validation():
    from qwen3_asr_rs_tpu.runtime.serving import Request

    with pytest.raises(ValueError):
        Request(np.zeros(100, np.float32), temperature=-1.0)


def test_traced_top_p_matches_static_per_row(rng):
    """apply_top_p with a traced per-row vector keeps exactly the rows
    a static scalar filter keeps (serving's nucleus segment variant)."""
    logits = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    ps = [0.8, 0.3, 1.0]
    traced = jax.jit(apply_top_p)(logits, jnp.asarray(ps, jnp.float32))
    for i, p in enumerate(ps):
        want = apply_top_p(logits[i][None], p)
        np.testing.assert_array_equal(
            np.isfinite(np.asarray(traced[i])),
            np.isfinite(np.asarray(want[0])),
        )
    # rows at 1.0 keep EVERY token (strict-before test true everywhere)
    assert np.isfinite(np.asarray(traced[2])).all()


def test_traced_scalar_top_p_in_jit(rng):
    """A traced scalar top_p compiles (one graph serves any mass) and
    matches the static filter bit for bit."""
    logits = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    fn = jax.jit(apply_top_p)
    for p in (0.2, 0.7):
        got = fn(logits, jnp.float32(p))
        want = apply_top_p(logits, p)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sample_token_traced_top_p_vector(rng):
    """sample_token with per-row traced top_p: a near-zero mass row is
    exactly argmax; a mass-1 row matches the unfiltered sample for the
    same key (the filter is the identity there)."""
    logits = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
    key = jax.random.PRNGKey(7)
    ids = sample_token(
        logits, key, 2.0, top_p=jnp.asarray([1e-9, 1.0], jnp.float32)
    )
    assert int(ids[0]) == int(np.argmax(np.asarray(logits)[0]))
    plain = sample_token(logits, key, 2.0)
    assert int(ids[1]) == int(plain[1])


def test_speculative_accept_first_token_distribution():
    """The speculative-sampling theorem, empirically: with drafts drawn
    from q, the first emitted token (accepted d_1 or the resample) is
    distributed exactly as the target p_1 — for an ADVERSARIAL q."""
    from qwen3_asr_rs_tpu.runtime.sampling import speculative_accept

    q = jnp.asarray([[0.7, 0.1, 0.1, 0.1],
                     [0.25, 0.25, 0.25, 0.25]], jnp.float32)
    p = jnp.asarray([[0.1, 0.6, 0.2, 0.1],
                     [0.05, 0.05, 0.8, 0.1],
                     [0.4, 0.3, 0.2, 0.1]], jnp.float32)

    def run(i):
        key = jax.random.PRNGKey(i)
        kd = jax.random.fold_in(key, 7)
        drafts = jnp.stack([
            jax.random.categorical(jax.random.fold_in(kd, 0),
                                   jnp.log(q[0])),
            jax.random.categorical(jax.random.fold_in(kd, 1),
                                   jnp.log(q[1])),
        ]).astype(jnp.int32)
        acc, nxt = speculative_accept(key, drafts, q, p)
        return jnp.where(acc >= 1, drafts[0], nxt)

    n = 20000
    firsts = np.asarray(jax.jit(jax.vmap(run))(jnp.arange(n)))
    emp = np.bincount(firsts, minlength=4) / n
    np.testing.assert_allclose(emp, np.asarray(p[0]), atol=0.02)


def test_speculative_accept_edge_cases():
    from qwen3_asr_rs_tpu.runtime.sampling import speculative_accept

    # q == p: every draft accepted, bonus drawn from p[k]
    p = jnp.asarray([[0.3, 0.3, 0.2, 0.2],
                     [0.1, 0.2, 0.3, 0.4],
                     [0.25, 0.25, 0.25, 0.25]], jnp.float32)
    q = p[:2]
    for i in range(64):
        key = jax.random.PRNGKey(i)
        drafts = jnp.asarray([i % 4, (i // 4) % 4], jnp.int32)
        acc, _ = jax.jit(speculative_accept)(key, drafts, q, p)
        assert int(acc) == 2

    # draft is one-hot on a token the target gives ZERO mass: always
    # reject at position 0, resample distributed as p[0] exactly
    # (residual = max(p - onehot, 0) == p because p[0] is 0 there)
    q0 = jnp.asarray([[1.0, 0.0, 0.0, 0.0],
                      [0.25, 0.25, 0.25, 0.25]], jnp.float32)
    p0 = jnp.asarray([[0.0, 0.5, 0.3, 0.2],
                      [0.1, 0.2, 0.3, 0.4],
                      [0.25, 0.25, 0.25, 0.25]], jnp.float32)

    def run(i):
        key = jax.random.PRNGKey(i)
        drafts = jnp.asarray([0, 0], jnp.int32)
        acc, nxt = speculative_accept(key, drafts, q0, p0)
        return acc, nxt

    n = 20000
    accs, nxts = jax.jit(jax.vmap(run))(jnp.arange(n))
    assert int(np.asarray(accs).max()) == 0
    emp = np.bincount(np.asarray(nxts), minlength=4) / n
    np.testing.assert_allclose(emp, np.asarray(p0[0]), atol=0.02)


def test_filtered_probs_matches_sample_token_support(rng):
    """filtered_probs is the distribution sample_token draws from: zero
    exactly outside the filtered support, and a top_k=1 filter is a
    one-hot on the argmax."""
    from qwen3_asr_rs_tpu.runtime.sampling import filtered_probs

    logits = jnp.asarray(rng.standard_normal(64), jnp.float32)
    probs = filtered_probs(logits, 0.9, top_k=8, top_p=0.7)
    assert float(jnp.sum(probs)) == pytest.approx(1.0, abs=1e-5)
    # support subset of the top-8 logits
    top8 = set(np.argsort(-np.asarray(logits))[:8].tolist())
    assert set(np.nonzero(np.asarray(probs))[0].tolist()) <= top8
    one = filtered_probs(logits, 1.3, top_k=1)
    assert int(np.argmax(np.asarray(one))) == int(np.argmax(np.asarray(logits)))
    assert float(one.max()) == pytest.approx(1.0, abs=1e-6)
