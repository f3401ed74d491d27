"""WER utility + batching HTTP server tests."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from qwen3_asr_rs_tpu.utils.wer import cer, edit_distance, wer


def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance(["a"], []) == 1


def test_wer_cer():
    assert wer("the quick brown fox", "the quick brown fox") == 0.0
    assert wer("the quick brown fox", "the slow brown fox") == 0.25
    assert wer("", "") == 0.0
    assert wer("", "word") == 1.0
    assert cer("你好世界", "你好地界") == 0.25


@pytest.fixture(scope="module")
def server():
    from qwen3_asr_rs_tpu.runtime.server import BatchingWorker, make_handler
    from test_engine_e2e import make_engine

    eng, *_ = make_engine(max_new=2)
    worker = BatchingWorker(eng, batch_window_ms=5.0, max_batch=4)
    worker.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    worker.stop()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"


@pytest.mark.slow
def test_transcribe_endpoint(server, tmp_path, rng):
    from test_audio_io import write_wav_pcm16

    wav = tmp_path / "req.wav"
    write_wav_pcm16(wav, rng.standard_normal(16000) * 0.1, 16000)
    body = wav.read_bytes()

    req = urllib.request.Request(
        f"{server}/transcribe", data=body, method="POST"
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert "text" in out and "language" in out


def test_concurrent_requests_batched(server, tmp_path, rng):
    from test_audio_io import write_wav_pcm16

    wav = tmp_path / "c.wav"
    write_wav_pcm16(wav, rng.standard_normal(16000) * 0.1, 16000)
    body = wav.read_bytes()

    results = []

    def hit():
        req = urllib.request.Request(
            f"{server}/transcribe", data=body, method="POST"
        )
        with urllib.request.urlopen(req) as r:
            results.append(json.loads(r.read()))

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    assert all("text" in r for r in results)
    # identical audio -> identical transcription regardless of batching
    assert len({r["text"] for r in results}) == 1


@pytest.mark.slow
def test_openai_transcriptions_endpoint(server, tmp_path, rng):
    """OpenAI Whisper-API route: multipart file upload, three formats."""
    from test_audio_io import write_wav_pcm16

    wav = tmp_path / "oai.wav"
    write_wav_pcm16(wav, rng.standard_normal(16000) * 0.1, 16000)
    audio = wav.read_bytes()

    def post(extra_fields):
        boundary = "testboundary42"
        parts = []
        for name, val in extra_fields.items():
            parts.append(
                f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="{name}"\r\n\r\n{val}\r\n'.encode()
            )
        parts.append(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="a.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n".encode()
            + audio + b"\r\n"
        )
        parts.append(f"--{boundary}--\r\n".encode())
        body = b"".join(parts)
        req = urllib.request.Request(
            f"{server}/v1/audio/transcriptions", data=body, method="POST",
            headers={
                "Content-Type":
                    f"multipart/form-data; boundary={boundary}",
            },
        )
        return urllib.request.urlopen(req, timeout=300)

    with post({}) as r:
        out = json.loads(r.read())
        assert "text" in out

    with post({"response_format": "verbose_json"}) as r:
        out = json.loads(r.read())
        assert out["task"] == "transcribe"
        assert "language" in out and "text" in out
        # Whisper-shaped duration + time-stamped segments
        assert abs(out["duration"] - 1.0) < 0.01
        assert isinstance(out["segments"], list)
        if out["text"].strip():
            (seg,) = out["segments"]
            assert seg["start"] == 0.0
            assert seg["end"] == out["duration"]
            assert seg["text"] == out["text"]
            # full Whisper verbose_json segment key set: strict clients
            # index these unconditionally
            for key in ("tokens", "temperature", "avg_logprob",
                        "compression_ratio", "no_speech_prob", "seek"):
                assert key in seg, key
            # word-level timestamps: flat top-level list (OpenAI
            # timestamp_granularities[]=word shape) + per-segment lists,
            # JSON-plain dicts with word/start/end
            assert isinstance(out["words"], list)
            assert out["words"] == [w for s in out["segments"]
                                    for w in s["words"]]
            for w in out["words"]:
                assert set(w) == {"word", "start", "end"}
                assert 0.0 <= w["start"] <= w["end"] <= out["duration"]

    with post({"response_format": "text"}) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        r.read()

    # per-request nucleus sampling (extension field): a tiny top_p
    # with temperature > 0 keeps only the top-1 token, so the text
    # equals the greedy transcription of the same audio
    with post({}) as r:
        greedy_text = json.loads(r.read())["text"]
    with post({"temperature": "2.0", "top_p": "0.000001"}) as r:
        out = json.loads(r.read())
        assert out["text"] == greedy_text
    # out-of-range top_p -> client error, not a server fault
    try:
        post({"temperature": "0.5", "top_p": "1.5"})
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400

    # missing file field -> OpenAI-style error object
    boundary = "b0"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="language"\r\n\r\nenglish\r\n--{boundary}--\r\n'
            ).encode()
    req = urllib.request.Request(
        f"{server}/v1/audio/transcriptions", data=body, method="POST",
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"},
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"]["type"] == (
            "invalid_request_error"
        )


def test_parse_multipart_binary_exact():
    """File bytes ending in 0x0A/0x0D must round-trip exactly (a naive
    strip-based parser truncated them)."""
    from qwen3_asr_rs_tpu.runtime.server import _parse_multipart

    payload = b"\x00\x01RIFF\x0a\x0d\x0a"
    boundary = "bx1"
    body = (
        f"--{boundary}\r\nContent-Disposition: form-data; "
        f'name="file"; filename="a.bin"\r\n'
        f"Content-Type: application/octet-stream\r\n\r\n".encode()
        + payload
        + f"\r\n--{boundary}\r\nContent-Disposition: form-data; "
        f'name="language"\r\n\r\nenglish\r\n--{boundary}--\r\n'.encode()
    )
    fields = _parse_multipart(
        f"multipart/form-data; boundary={boundary}", body
    )
    assert fields["file"] == payload
    assert fields["language"] == b"english"
