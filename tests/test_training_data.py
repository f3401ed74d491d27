"""ASR data pipeline: manifest, bucketed batches, masks, async ckpt."""

import json
import sys

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qwen3_asr_rs_tpu.config import tiny_test_config
from qwen3_asr_rs_tpu.models.audio_encoder import init_encoder_params
from qwen3_asr_rs_tpu.models.text_decoder import init_decoder_params
from qwen3_asr_rs_tpu.runtime.prompt import PROMPT_HEADER, build_prompt
from qwen3_asr_rs_tpu.tokenizer import ENDOFTEXT_TOKEN_ID, IM_END_TOKEN_ID
from qwen3_asr_rs_tpu.training.data import (
    AsrDataset,
    Utterance,
    prefetch_to_device,
    read_manifest,
)
from qwen3_asr_rs_tpu.training.train_step import TrainState, make_train_step

from test_audio_io import write_wav_pcm16
from test_engine_e2e import MockTokenizer

pytestmark = pytest.mark.slow  # heavy parity/e2e: quick tier skips


@pytest.fixture()
def corpus(tmp_path, rng):
    """Manifest with 5 clips across two buckets (one with language)."""
    rows = []
    for i, (n, lang) in enumerate(
        [(8000, None), (16000, "english"), (9000, None),
         (24000, "chinese"), (7000, None)]
    ):
        p = tmp_path / f"clip{i}.wav"
        write_wav_pcm16(p, (rng.standard_normal(n) * 0.1), 16000)
        rows.append(
            {"audio": p.name, "text": f"hello world {i}",
             **({"language": lang} if lang else {})}
        )
    manifest = tmp_path / "train.jsonl"
    manifest.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return manifest


def test_read_manifest_resolves_paths(corpus):
    utts = read_manifest(corpus)
    assert len(utts) == 5
    assert all(u.audio.exists() for u in utts)
    assert utts[1].language == "english"


def test_read_manifest_rejects_bad_lines(tmp_path):
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"audio": "x.wav"}\n')  # missing text
    with pytest.raises(ValueError, match="bad manifest line"):
        read_manifest(bad)


def test_batches_static_shapes_and_masks(corpus):
    cfg = tiny_test_config()
    ds = AsrDataset(
        corpus, MockTokenizer(), config=cfg,
        chunk_buckets=(2, 4), batch_size=2, max_text_tokens=32,
    )
    batches = list(ds.batches())
    assert batches, "no batches emitted"
    cf = cfg.audio.chunk_frames
    for b in batches:
        bsz, bins, frames = b["mel"].shape
        assert bsz == 2 and bins == cfg.audio.num_mel_bins
        assert frames % cf == 0
        assert b["token_ids"].shape == b["loss_mask"].shape
        assert b["token_ids"].shape[1] % 16 == 0
        # prompt header is token-exact with inference
        np.testing.assert_array_equal(
            b["token_ids"][0, : len(PROMPT_HEADER)], PROMPT_HEADER
        )
        # every row trains at least one position, ending at im_end
        for r in range(bsz):
            m = b["loss_mask"][r]
            if m.sum() == 0:
                continue  # collate filler row
            last = int(np.nonzero(m)[0][-1])
            assert b["token_ids"][r, last + 1] == IM_END_TOKEN_ID
            # the first trained position is the prompt's last token
            first = int(np.nonzero(m)[0][0])
            n_audio = int(b["n_audio"][r])
            prompt = build_prompt(n_audio, None, MockTokenizer())
            assert first == len(prompt) - 1
    # all 5 utterances appear across batches (2+2+1 -> filler pads last)
    total_trained_rows = sum(
        int((b["loss_mask"].sum(axis=1) > 0).sum()) for b in batches
    )
    assert total_trained_rows == 5


def test_language_rows_train_the_language_tag(corpus):
    from qwen3_asr_rs_tpu.tokenizer import ASR_TEXT_TOKEN_ID

    ds = AsrDataset(
        corpus, MockTokenizer(), config=tiny_test_config(),
        chunk_buckets=(2, 4), batch_size=1, max_text_tokens=32,
    )
    seen_asr_text = False
    for b in ds.batches():
        ids = b["token_ids"][0]
        if (ids == ASR_TEXT_TOKEN_ID).any():
            seen_asr_text = True
            pos = int(np.nonzero(ids == ASR_TEXT_TOKEN_ID)[0][0])
            assert b["loss_mask"][0, pos - 1] == 1.0  # tag is a target
    assert seen_asr_text


def _vocab_cfg():
    """tiny config with the real vocab so special-token ids embed."""
    import dataclasses

    cfg = tiny_test_config()
    text = dataclasses.replace(cfg.text, vocab_size=151936)
    return dataclasses.replace(
        cfg,
        thinker_config=dataclasses.replace(
            cfg.thinker_config, text_config=text
        ),
    )


def test_train_step_consumes_loader_batches(corpus):
    cfg = _vocab_cfg()
    ds = AsrDataset(
        corpus, MockTokenizer(), config=cfg,
        chunk_buckets=(2, 4), batch_size=2, max_text_tokens=16,
    )
    params = {
        "encoder": init_encoder_params(cfg.audio, dtype=jnp.float32),
        "decoder": init_decoder_params(cfg.text, dtype=jnp.float32),
    }
    opt = optax.adamw(1e-3)
    state = TrainState(
        params=params, opt_state=opt.init(params), step=jnp.int32(0)
    )
    import jax

    step = jax.jit(make_train_step(cfg, opt, max_position=256))
    losses = []
    for batch in prefetch_to_device(ds.batches(), size=2):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses and all(np.isfinite(losses))
    assert int(state.step) == len(losses)


def test_async_checkpointer_roundtrip(tmp_path):
    from qwen3_asr_rs_tpu.training.checkpoint import AsyncTrainCheckpointer

    cfg = tiny_test_config()
    params = {
        "encoder": init_encoder_params(cfg.audio, dtype=jnp.float32),
        "decoder": init_decoder_params(cfg.text, dtype=jnp.float32),
    }
    opt = optax.adamw(1e-3)
    state = TrainState(
        params=params, opt_state=opt.init(params), step=jnp.int32(0)
    )
    ck = AsyncTrainCheckpointer(tmp_path / "ckpts", max_to_keep=2)
    for s in (1, 2, 3):
        ck.save(
            TrainState(
                params=state.params, opt_state=state.opt_state,
                step=jnp.int32(s),
            )
        )
    ck.wait()
    assert ck.latest().name == "step_00000003"
    # pruned to max_to_keep
    assert len(list((tmp_path / "ckpts").glob("step_*"))) == 2

    restored = ck.restore_latest(state)
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(restored.params["decoder"]["final_ln_w"], np.float32),
        np.asarray(state.params["decoder"]["final_ln_w"], np.float32),
    )
    ck.close()


def test_dataset_sharding_partitions_manifest(corpus):
    """dp-host shards: equal batch counts, trained rows disjoint, union
    of trained rows covers the epoch (filler batches carry zero loss)."""
    kw = dict(
        tokenizer=MockTokenizer(), config=tiny_test_config(),
        chunk_buckets=(2, 4), batch_size=1, max_text_tokens=16, seed=3,
    )
    trained, counts = [], []
    for i in range(2):
        ds = AsrDataset(corpus, shard_index=i, num_shards=2, **kw)
        batches = list(ds.batches())
        counts.append(len(batches))
        texts = set()
        for b in batches:
            for r in range(b["loss_mask"].shape[0]):
                if b["loss_mask"][r].sum() > 0:
                    texts.add(
                        tuple(np.asarray(b["token_ids"][r]).tolist())
                    )
        trained.append(texts)
    # LOCKSTEP: every shard yields the same number of batches
    assert counts[0] == counts[1]
    # trained rows are disjoint and cover all 5 utterances
    assert not (trained[0] & trained[1])
    assert len(trained[0]) + len(trained[1]) == 5

    with pytest.raises(ValueError):
        AsrDataset(corpus, shard_index=2, num_shards=2, **kw)


def test_sharded_batches_lockstep_with_unreadable_audio(corpus, tmp_path):
    """A mid-epoch unreadable file is substituted with a zero-loss filler,
    never skipped — shard batch counts stay identical (multi-host dp
    training must not desync; ADVICE r2)."""
    kw = dict(
        tokenizer=MockTokenizer(), config=tiny_test_config(),
        chunk_buckets=(2, 4), batch_size=2, max_text_tokens=16, seed=0,
    )
    baseline = [
        len(list(AsrDataset(corpus, shard_index=i, num_shards=2,
                            **kw).batches()))
        for i in range(2)
    ]
    assert baseline[0] == baseline[1]

    # corrupt one clip AFTER the probe: buckets are cached, so the
    # schedule is unchanged and make_example fails mid-epoch
    counts = []
    for i in range(2):
        ds = AsrDataset(corpus, shard_index=i, num_shards=2, **kw)
        for j in range(len(ds.utts)):
            ds._bucket_of(j)  # populate the probe cache
        victim = ds.utts[0].audio
        data = victim.read_bytes()
        victim.write_bytes(b"not a wav file")
        try:
            batches = list(ds.batches())
        finally:
            victim.write_bytes(data)
        counts.append(len(batches))
        for b in batches:  # shapes stay static even with filler rows
            assert b["token_ids"].shape[0] == 2
    assert counts == baseline


def test_sharded_batches_use_manifest_duration(corpus, monkeypatch):
    """With 'duration' in the manifest the scheduler never probes audio."""
    rows = [json.loads(l) for l in corpus.read_text().splitlines()]
    lens = [8000, 16000, 9000, 24000, 7000]
    for r, n in zip(rows, lens):
        r["duration"] = n / 16000
    corpus.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    ds = AsrDataset(
        corpus, MockTokenizer(), config=tiny_test_config(),
        chunk_buckets=(2, 4), batch_size=2, max_text_tokens=16,
        shard_index=0, num_shards=2,
    )
    import qwen3_asr_rs_tpu.audio.load as load_mod

    real_load = load_mod.load_audio
    calls = []

    def counting_load(*a, **k):
        calls.append(a)
        return real_load(*a, **k)

    monkeypatch.setattr(load_mod, "load_audio", counting_load)
    for j in range(len(ds.utts)):
        assert ds._bucket_of(j) in (2, 4)
    assert not calls, "duration-annotated utterances must not be probed"


def test_async_checkpointer_steady_state_nonblocking(tmp_path):
    """save() must not join its own write: once more than max_to_keep
    checkpoints exist, pruning runs BEFORE dispatch and never waits on
    the writer (ADVICE r2: every save was calling wait_until_finished)."""
    from qwen3_asr_rs_tpu.training.checkpoint import AsyncTrainCheckpointer

    cfg = tiny_test_config()
    dec = init_decoder_params(cfg.text, dtype=jnp.float32)
    opt = optax.sgd(1e-3)
    state = TrainState(params=dec, opt_state=opt.init(dec),
                       step=jnp.int32(0))

    ck = AsyncTrainCheckpointer(tmp_path / "ck", max_to_keep=2)
    waits = []
    real_gc = ck._gc

    def counting_gc():
        # count only waits issued by _gc itself (orbax's save() may
        # legitimately join the PREVIOUS write internally)
        orig = ck._ckptr.wait_until_finished
        ck._ckptr.wait_until_finished = (
            lambda: waits.append(1) or orig()
        )
        try:
            real_gc()
        finally:
            ck._ckptr.wait_until_finished = orig

    ck._gc = counting_gc
    for s in range(1, 7):
        ck.save(TrainState(params=state.params, opt_state=state.opt_state,
                           step=jnp.int32(s)))
    assert not waits, "steady-state save() joined the async writer"
    ck.wait()
    kept = sorted(p.name for p in (tmp_path / "ck").glob("step_*"))
    assert kept == ["step_00000005", "step_00000006"]
    ck.close()


def test_async_checkpointer_best_k(tmp_path):
    """Best-metric checkpoints survive pruning; restore_best works."""
    from qwen3_asr_rs_tpu.training.checkpoint import AsyncTrainCheckpointer

    cfg = tiny_test_config()
    dec = init_decoder_params(cfg.text, dtype=jnp.float32)
    opt = optax.sgd(1e-3)
    state = TrainState(
        params=dec, opt_state=opt.init(dec), step=jnp.int32(0)
    )

    ck = AsyncTrainCheckpointer(
        tmp_path / "ck", max_to_keep=2, keep_best=1
    )
    losses = {1: 5.0, 2: 1.5, 3: 4.0, 4: 3.0, 5: 2.0}
    for step, loss in losses.items():
        state = TrainState(
            params=state.params, opt_state=state.opt_state,
            step=jnp.int32(step),
        )
        ck.save(state, metric=loss)
    ck.wait()
    kept = sorted(p.name for p in (tmp_path / "ck").glob("step_*"))
    # newest two (4, 5) plus the best (2)
    assert kept == ["step_00000002", "step_00000004", "step_00000005"]
    assert ck.best().name == "step_00000002"
    restored = ck.restore_best(state)
    assert int(restored.step) == 2
    ck.close()


def test_sharded_steps_are_bucket_homogeneous(tmp_path, rng):
    """At every global step, all shards' batches share ONE chunk bucket:
    multi-host jax requires every process to run the same compiled
    program per step, so equal batch counts alone are not enough."""
    import json as _json

    rows = []
    for i, n in enumerate([8000, 16000, 50000, 9000, 60000, 7000, 55000]):
        p = tmp_path / f"clip{i}.wav"
        write_wav_pcm16(p, (rng.standard_normal(n) * 0.1), 16000)
        rows.append({"audio": p.name, "text": f"hello {i}"})
    manifest = tmp_path / "train.jsonl"
    manifest.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")

    kw = dict(
        tokenizer=MockTokenizer(), config=tiny_test_config(),
        chunk_buckets=(2, 4), batch_size=1, max_text_tokens=16, seed=3,
    )
    per_shard = []
    for i in range(2):
        ds = AsrDataset(manifest, shard_index=i, num_shards=2, **kw)
        per_shard.append(
            [b["mel"].shape[-1] for b in ds.batches(epochs=2)]
        )
    assert len(per_shard[0]) == len(per_shard[1])
    assert per_shard[0] == per_shard[1]  # same bucket shape every step
    assert len(set(per_shard[0])) > 1   # corpus genuinely spans buckets


def test_inaccurate_manifest_duration_still_trains(tmp_path, rng):
    """A manifest duration that rounds the utterance into a LARGER
    bucket than its audio must not drop it: the build pads up to the
    scheduled bucket (exact — bucketing IS padding)."""
    import json as _json

    p = tmp_path / "clip.wav"
    write_wav_pcm16(p, (rng.standard_normal(31000) * 0.1), 16000)
    manifest = tmp_path / "train.jsonl"
    # true bucket at 31000 samples is 2 chunks; duration 2.6 s probes 4
    manifest.write_text(_json.dumps(
        {"audio": p.name, "text": "hello", "duration": 2.6}) + "\n")

    kw = dict(
        tokenizer=MockTokenizer(), config=tiny_test_config(),
        chunk_buckets=(2, 4), batch_size=1, max_text_tokens=16, seed=0,
    )
    trained = 0
    for i in range(2):
        ds = AsrDataset(manifest, shard_index=i, num_shards=2, **kw)
        for b in ds.batches():
            if b["loss_mask"].sum() > 0:
                trained += 1
    assert trained == 1  # one real batch across both shards, not filler


def test_checkpoint_rollback_resume_prunes_correctly(tmp_path):
    """After restoring an EARLIER step and resuming, recency retention
    must keep the newly written checkpoints, not the stale high-numbered
    pre-rollback dirs (save order, not numeric order)."""
    import jax.numpy as jnp
    import optax

    from qwen3_asr_rs_tpu.training.checkpoint import AsyncTrainCheckpointer

    params = {"w": jnp.ones((4,))}
    opt = optax.sgd(1e-2)

    def state(step):
        return TrainState(
            params=params, opt_state=opt.init(params),
            step=jnp.int32(step),
        )

    ck = AsyncTrainCheckpointer(tmp_path, max_to_keep=2)
    for s in (2, 99, 100):
        ck.save(state(s))
    ck.close()

    # "rollback": new session, resume from an early step
    ck2 = AsyncTrainCheckpointer(tmp_path, max_to_keep=2)
    for s in (3, 4):
        ck2.save(state(s))
    ck2.wait()
    ck2._gc()
    kept = {p.name for p in ck2._step_dirs()}
    ck2.close()
    assert "step_00000003" in kept and "step_00000004" in kept
    assert "step_00000099" not in kept and "step_00000100" not in kept


def test_checkpoint_journal_drops_pruned_entries(tmp_path):
    """metrics.json must not keep ghost entries for pruned checkpoints
    (they would waste best-K protection in the next session)."""
    import json

    import jax.numpy as jnp
    import optax

    from qwen3_asr_rs_tpu.training.checkpoint import AsyncTrainCheckpointer

    params = {"w": jnp.ones((4,))}
    opt = optax.sgd(1e-2)

    def state(step):
        return TrainState(
            params=params, opt_state=opt.init(params),
            step=jnp.int32(step),
        )

    ck = AsyncTrainCheckpointer(tmp_path, max_to_keep=1, keep_best=1)
    ck.save(state(1), metric=5.0)
    ck.save(state(2), metric=1.0)  # the best
    ck.save(state(3), metric=9.0)
    ck.wait()
    ck._gc()
    ck.close()
    journal = json.loads((tmp_path / "metrics.json").read_text())
    on_disk = {int(p.name.split("_")[1]) for p in ck._step_dirs()}
    assert set(map(int, journal)) <= on_disk
    assert 2 in on_disk  # best survived

    # corrupt journal must not poison the next constructor
    (tmp_path / "metrics.json").write_text('{"truncated')
    ck3 = AsyncTrainCheckpointer(tmp_path, max_to_keep=1)
    ck3.close()
